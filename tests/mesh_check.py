"""Standalone multi-device mesh validation (run as a subprocess).

Forces an 8-device virtual CPU backend (the platform is fixed per process at
first jax import, and the ambient environment may pin the real TPU), then
asserts:
  1. DP equivalence: pjit data-parallel train step == single-device step on
     the same global batch (params replicated, batch sharded, XLA psum).
  2. TP placement equivalence: output-channel-sharded kernels give the same
     numbers.
  3. The __graft_entry__ dry run executes.

Exit code 0 on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache_cpu")

from vae_gan_mark_tpu.config import get_config  # noqa: E402
from vae_gan_mark_tpu.data.synthetic import device_batch, SyntheticPatchDataset  # noqa: E402
from vae_gan_mark_tpu.models.vgg import load_vgg_params  # noqa: E402
from vae_gan_mark_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, partition_params, replicate_tree, shard_batch)
from vae_gan_mark_tpu.train.state import create_train_state  # noqa: E402
from vae_gan_mark_tpu.train.step import build_train_step  # noqa: E402


def main():
    assert jax.device_count() == 8, jax.devices()

    cfg = get_config("v2", patch_h=32, patch_w=64, compute_dtype="float32",
                     enc_chans=(8, 16, 24, 64), bottleneck_ch=64, z_ch=16,
                     char_emb_dim=16, char_rnn_hidden=16, max_text_len=12,
                     batch_size=8)
    ds = SyntheticPatchDataset(cfg, num_samples=32, seed=0)
    batch = device_batch(ds.batch(8, 0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    vgg = load_vgg_params()
    step = jax.jit(build_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    kl = jnp.float32(1e-4)

    s1, m1 = step(state, vgg, batch, rng, kl)
    m1 = {k: float(v) for k, v in m1.items()}
    print("single-device:", m1)

    # --- DP over 8 devices ---
    mesh = make_mesh(jax.devices(), model_parallel=1)
    s8, m8 = step(replicate_tree(state, mesh), replicate_tree(vgg, mesh),
                  shard_batch(batch, mesh), rng, kl)
    m8 = {k: float(v) for k, v in m8.items()}
    print("dp8:", m8)
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"DP mismatch: {k}")
    # Params after one Adam step: a last-ulp cross-device reassociation in a
    # near-zero gradient flips g/sqrt(v) and moves that param by +-lr (1e-4),
    # so elementwise agreement is only meaningful at the lr scale.
    for a, b in zip(jax.tree.leaves(s1.g_params),
                    jax.tree.leaves(s8.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3e-4)
    print("DP equivalence ok")

    # --- DP x TP (4x2) ---
    mesh2 = make_mesh(jax.devices(), model_parallel=2)
    state_tp = replicate_tree(state, mesh2)
    state_tp = state_tp.replace(
        g_params=partition_params(state_tp.g_params, mesh2,
                                  kernel_min_ch=64))
    s2, m2 = step(state_tp, replicate_tree(vgg, mesh2),
                  shard_batch(batch, mesh2), rng, kl)
    m2 = {k: float(v) for k, v in m2.items()}
    print("dp4xtp2:", m2)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"TP mismatch: {k}")
    print("TP placement equivalence ok")

    # --- graft dry run ---
    import importlib
    mod = importlib.import_module("__graft_entry__")
    mod.dryrun_multichip(8)
    print("ALL MESH CHECKS PASSED")


if __name__ == "__main__":
    main()
