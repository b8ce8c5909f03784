"""Worker for the multi-process data-parallel equivalence test.

Usage (launched by tests/test_multiprocess.py with a cleaned environment:
JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4):

    python tests/mp_train_worker.py RANK NPROCS PORT OUT_JSON

Each process sees 4 virtual CPU devices; NPROCS=2 forms one 8-device
runtime (NPROCS=1 is the single-process control with 8 local devices).
Every rank builds the same synthetic dataset, loads ONLY its slice of the
global batch, assembles it with make_array_from_process_local_data, and
runs 3 jitted DP train steps. Rank 0 writes the final metrics to OUT_JSON —
they must match the single-process control (global-batch-mean semantics are
process-count-invariant).
"""

import json
import sys


def main():
    rank, nprocs, port, out_json = (int(sys.argv[1]), int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "steps"
    import jax
    from vae_gan_mark_tpu.parallel import distributed

    if nprocs > 1:
        distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=rank)
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    from vae_gan_mark_tpu.config import get_config
    from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset
    from vae_gan_mark_tpu.models.vgg import load_vgg_params
    from vae_gan_mark_tpu.parallel.mesh import make_mesh, replicate_tree
    from vae_gan_mark_tpu.train.state import create_train_state
    from vae_gan_mark_tpu.train.step import jit_train_step

    cfg = get_config("v2", patch_h=32, patch_w=64, compute_dtype="float32",
                     enc_chans=(8, 16, 24, 32), bottleneck_ch=48, z_ch=16,
                     char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
                     batch_size=8)
    mesh = make_mesh()  # (data=8, model=1) over the global devices

    # Establish the Gloo communicator contexts NOW, while all ranks are in
    # lockstep: context creation has a 30 s key-value handshake deadline,
    # and the minutes-long local model compiles below would otherwise skew
    # the ranks past it at the first real collective.
    import numpy as np
    warm_local = np.ones((8 // jax.process_count(), 1), np.float32)
    warm = distributed.global_batch_from_local({"x": warm_local}, mesh)
    assert float(jnp.sum(warm["x"])) == 8.0

    global_bs = 8
    ds = SyntheticPatchDataset(cfg, num_samples=32, seed=0)

    if mode == "trainer":
        # Full Trainer epoch: exercises the multi-process paths the bare
        # steps below do not — per-process batch assembly inside
        # Trainer._put, sharded-eval triplet collection from addressable
        # shards, process-0-gated logging, barrier-fenced checkpoints.
        import os
        import tempfile
        from vae_gan_mark_tpu.train.loop import Trainer

        sl = distributed.process_local_slice(global_bs)

        def data(epoch):
            for i in range(2):
                full = ds.batch(global_bs, i)
                yield {k: v[sl] for k, v in full.items()}

        # Fresh workdir per run: a stale dir (e.g. a reused random port on
        # a shared machine) would make Trainer auto-resume from an old
        # last_checkpoint and the asserted results would not reflect a
        # fresh 1-epoch run. Rank 0 clears it while ranks are in lockstep.
        wd = os.path.join(tempfile.gettempdir(),
                          f"mp_trainer_{port}")
        if jax.process_index() == 0 and os.path.isdir(wd):
            import shutil
            shutil.rmtree(wd)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("workdir_cleared")
        trainer = Trainer(cfg, data, data, workdir=wd, use_mesh=True)
        best = trainer.fit(epochs=1)
        out = {"best_val": float(best),
               "metrics_jsonl_exists": os.path.exists(
                   os.path.join(wd, f"{cfg.name}.metrics.jsonl")),
               "ckpt_exists": os.path.isdir(
                   os.path.join(wd, "last_checkpoint"))}
        if jax.process_index() == 0:
            with open(out_json, "w") as f:
                json.dump(out, f)
        print(f"rank {rank} trainer done: {out}", flush=True)
        return

    def global_batch(step_idx):
        full = ds.batch(global_bs, step_idx)
        full = {k: v for k, v in full.items() if k != "raw_text"}
        sl = distributed.process_local_slice(global_bs)
        local = {k: v[sl] for k, v in full.items()}
        return distributed.global_batch_from_local(local, mesh)

    # init from the full batch spec (shapes only matter)
    init_full = {k: jnp.asarray(v) for k, v in ds.batch(global_bs, 0).items()
                 if k != "raw_text"}
    state = create_train_state(cfg, jax.random.PRNGKey(0), init_full)
    state = replicate_tree(state, mesh)
    vgg = replicate_tree(load_vgg_params(), mesh)

    step = jit_train_step(cfg)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        state, m = step(state, vgg, global_batch(i), rng,
                        jnp.float32(1e-4))
    metrics = {k: float(v) for k, v in m.items()}
    if jax.process_index() == 0:
        with open(out_json, "w") as f:
            json.dump(metrics, f)
    print(f"rank {rank} done: {metrics}", flush=True)


if __name__ == "__main__":
    main()
