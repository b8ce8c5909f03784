"""Command-line entry point replacing the reference's five scripts.

    python -m vae_gan_mark_tpu.train --variant {vanilla,lr_sh,unet,v2,oldv} \
        --json-dir ... --ru-dir ... --en-dir ... --mask-dir ... \
        [--epochs N] [--batch-size N] [--workdir DIR] [--synthetic]

The reference hardcodes dataset paths and reads hyperparameters from module
constants mirrored into wandb.config (vae-gan.py:485-510); here every
constant is a CLI-overridable config field and credentials come only from the
environment (WANDB_API_KEY — never hardcoded; see the leaked key the
reference ships, SURVEY.md §0).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from vae_gan_mark_tpu.config import VARIANTS, get_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vae_gan_mark_tpu.train",
                                description=__doc__)
    p.add_argument("--variant", choices=sorted(VARIANTS), default="v2")
    p.add_argument("--json-dir", help="annotation dir (*.json)")
    p.add_argument("--ru-dir", help="RU images dir")
    p.add_argument("--en-dir", help="EN images dir")
    p.add_argument("--mask-dir", help="mask dir ({base}_ru.png)")
    p.add_argument("--workdir", default="./checkpoints_vaegan",
                   help="checkpoints + logs dir")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic dataset (smoke/bench)")
    p.add_argument("--synthetic-samples", type=int, default=256)
    p.add_argument("--device-data", choices=("auto", "on", "off"),
                   default="auto",
                   help="keep the synthetic dataset device-resident and "
                        "gather batches on-chip (auto: on for "
                        "single-process runs that fit in HBM)")
    p.add_argument("--synthetic-text-vocab", type=int, default=0,
                   help="draw synthetic mark strings from a closed N-string "
                        "vocabulary shared across seeds (0 = per-sample "
                        "random strings); mirrors real watermark corpora "
                        "where a limited set of marks repeats")
    p.add_argument("--synthetic-text-tile", action="store_true",
                   help="watermark-style synthetic task: tile the mark "
                        "string at fixed absolute positions across the "
                        "patch, visible inside the mask (~25-35%% of masked "
                        "pixels are glyphs vs ~5%% for the boxed single "
                        "line) — makes text conditioning dominate masked "
                        "error at run scale")
    p.add_argument("--synthetic-structured", action="store_true",
                   help="smooth upsampled-noise backgrounds (the disk-run "
                        "creative look) instead of per-pixel noise — gives "
                        "the discriminator a matchable distribution so the "
                        "hinge-GAN term carries signal instead of swamping "
                        "glyph learning (examples/vocab_run analysis)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--loader", choices=("host", "device"), default="host",
                   help="real-data input path: 'host' warps with cv2/native "
                        "on CPU workers (use with --patch-cache for "
                        "steady-state memory-speed epochs); 'device' "
                        "decodes+bucket-crops on host and runs the "
                        "perspective warp inside a jitted TPU kernel "
                        "(data/device_pipeline.py) — EXPERIMENTAL: loses "
                        "~3 orders of magnitude on network-tunneled chips "
                        "(examples/disk_run/device_loader_epoch.json, "
                        "~1 img/s); only a candidate win on TPU-VM-local "
                        "many-core hosts, see DESIGN.md")
    p.add_argument("--patch-cache", default=None, metavar="DIR",
                   help="persistent decoded-patch cache dir (host loader "
                        "only): decode+warp each sample once, stream later "
                        "epochs from a memmap at disk speed; prewarm "
                        "explicitly with python -m "
                        "vae_gan_mark_tpu.data.patch_cache")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of epoch 2 here")
    p.add_argument("--multi-step", type=int, default=1, metavar="K",
                   help="scan K train steps per device dispatch "
                        "(train/step.py:build_multi_train_step) — identical "
                        "semantics, amortizes per-dispatch host/tunnel "
                        "latency; pick K dividing steps-per-epoch")
    p.add_argument("--no-mesh", action="store_true",
                   help="disable the device mesh (single device)")
    # Multi-process (multi-host) execution: pass --coordinator (and
    # --num-processes/--process-id when not inferable) on every host, or
    # set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax NaN localization (the heavyweight "
                        "equivalent of torch detect_anomaly)")
    # Any config field is overridable: --set epochs=10 --set lr_g=2e-4
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                   help="override a VariantConfig field")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    return p


def parse_overrides(cfg_cls, pairs):
    fields = {f.name: f.type for f in dataclasses.fields(cfg_cls)}
    out = {}
    for pair in pairs:
        key, _, val = pair.partition("=")
        if "." in key:
            # Nested dataclass field, e.g. scheduler.patience=5.
            head, _, sub = key.partition(".")
            if head not in fields:
                raise SystemExit(f"unknown config field: {head}")
            parent = getattr(get_config("v2"), head)
            subfields = {f.name for f in dataclasses.fields(parent)}
            if sub not in subfields:
                raise SystemExit(f"unknown config field: {key}")
            current = getattr(parent, sub)
        else:
            if key not in fields:
                raise SystemExit(f"unknown config field: {key}")
            current = getattr(get_config("v2"), key)
        if isinstance(current, bool):
            out[key] = val.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            out[key] = int(val)
        elif isinstance(current, float):
            out[key] = float(val)
        elif isinstance(current, tuple):
            out[key] = tuple(int(x) for x in val.split(","))
        else:
            out[key] = val
    return out


def main(argv=None):
    from vae_gan_mark_tpu.config import VariantConfig
    args = build_parser().parse_args(argv)
    overrides = parse_overrides(VariantConfig, args.set)
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    cfg = get_config(args.variant, **overrides)

    # Must run before any other JAX use so the processes form one runtime.
    from vae_gan_mark_tpu.parallel import distributed
    distributed.initialize(args.coordinator, args.num_processes,
                           args.process_id)
    import jax
    # Persistent compile cache: repeat runs of the same config skip the
    # (minutes-long on first use) XLA compile.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.expanduser("~/.cache/vae_gan_mark_tpu/jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n_proc, proc_id = jax.process_count(), jax.process_index()

    from vae_gan_mark_tpu.train.loop import Trainer

    if args.debug_nans:
        from vae_gan_mark_tpu.utils.debug import enable_nan_debugging
        enable_nan_debugging()

    # In multi-process runs each process loads only its rows of the global
    # batch; Trainer assembles them into globally sharded arrays.
    assert cfg.batch_size % n_proc == 0, (cfg.batch_size, n_proc)
    local_bs = cfg.batch_size // n_proc

    if args.synthetic:
        from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset
        train_ds = SyntheticPatchDataset(cfg, args.synthetic_samples,
                                         seed=args.seed,
                                         text_vocab=args.synthetic_text_vocab,
                                         text_tile=args.synthetic_text_tile,
                                         structured=args.synthetic_structured)
        val_ds = SyntheticPatchDataset(cfg, max(args.synthetic_samples // 8,
                                                cfg.batch_size),
                                       seed=args.seed + 1,
                                       text_vocab=args.synthetic_text_vocab,
                                       text_tile=args.synthetic_text_tile,
                                       structured=args.synthetic_structured)
        steps = args.synthetic_samples // cfg.batch_size

        # Device-resident gathers (data/device_synthetic.py) replace the
        # per-batch host->device image transfers — the dominant cost of
        # small-batch training on a tunneled chip. Identical batch content
        # and order, so checkpoints resume across either path. "auto": on
        # for single-process runs whose dataset fits comfortably in HBM.
        est_bytes = (train_ds.ru.nbytes + train_ds.en.nbytes
                     + train_ds.mask.nbytes)
        use_device_data = (args.device_data == "on"
                           or (args.device_data == "auto" and n_proc == 1
                               and est_bytes < 4 << 30))
        if use_device_data:
            assert n_proc == 1, "--device-data on requires single-process"
            from vae_gan_mark_tpu.data.device_synthetic import (
                DeviceResidentSynthetic)
            train_data = DeviceResidentSynthetic(
                train_ds, cfg.batch_size, steps)
            val_data = DeviceResidentSynthetic(
                val_ds, cfg.batch_size, max(steps // 8, 1),
                advance_per_epoch=False)
            print(f"device-resident synthetic data: "
                  f"{train_data.nbytes() / 1e6:.0f} MB train + "
                  f"{val_data.nbytes() / 1e6:.0f} MB val in HBM")
        else:
            def local_rows(batch):
                sl = distributed.process_local_slice(cfg.batch_size)
                return {k: v[sl] for k, v in batch.items()}

            def train_data(epoch):
                for i in range(steps):
                    yield local_rows(train_ds.batch(cfg.batch_size,
                                                    i + epoch * steps))

            def val_data(epoch):
                for i in range(max(steps // 8, 1)):
                    yield local_rows(val_ds.batch(cfg.batch_size, i))
    else:
        if not all((args.json_dir, args.ru_dir, args.en_dir, args.mask_dir)):
            raise SystemExit("--json-dir/--ru-dir/--en-dir/--mask-dir are "
                             "required without --synthetic")
        from vae_gan_mark_tpu.data.index import build_index, grouped_split
        if args.loader == "device":
            print("[warn] --loader device is experimental: on a "
                  "network-tunneled chip it measured ~1 img/s vs the host "
                  "loader's 1209 img/s cached steady state "
                  "(examples/disk_run/device_loader_epoch.json). Use "
                  "--loader host --patch-cache DIR unless the host is a "
                  "many-core TPU VM with a local PCIe link.",
                  flush=True)
            from vae_gan_mark_tpu.data.device_pipeline import (
                DeviceWarpLoader as Loader)
        else:
            from vae_gan_mark_tpu.data.pipeline import (
                HostWarpLoader as Loader)
        samples = build_index(args.json_dir, args.ru_dir, args.en_dir,
                              args.mask_dir)
        print(f"indexed {len(samples)} samples")
        train_idx, val_idx = grouped_split(samples, cfg.val_split,
                                           cfg.split_seed)
        print(f"train/val: {len(train_idx)}/{len(val_idx)}")
        if n_proc > 1:
            # Disjoint per-process index shards (the split itself is
            # identical on every process: same seed, same listing).
            # Contiguous equal-length blocks — NOT strided leftovers — so
            # every rank yields the same number of batches with identical
            # shapes; a rank with one extra batch would deadlock the
            # collective train step. Decode failures inside a batch produce
            # zero-dummy samples (data/pipeline.py), not dropped batches,
            # so the per-rank streams stay aligned.
            def shard(idx):
                per = len(idx) // n_proc
                return idx[proc_id * per:(proc_id + 1) * per]
            train_idx, val_idx = shard(train_idx), shard(val_idx)
        text_embed_fn = None
        if cfg.text_encoder == "sbert":
            from vae_gan_mark_tpu.data.text_embed import make_text_embedder
            text_embed_fn = make_text_embedder()
        cache_kw = {}
        if args.patch_cache:
            if args.loader == "device":
                raise SystemExit("--patch-cache requires --loader host "
                                 "(the device loader warps on-chip)")
            cache_kw["cache_dir"] = args.patch_cache
        train_data = Loader(cfg, samples, train_idx, batch_size=local_bs,
                            shuffle=True, drop_last=True, seed=args.seed,
                            num_workers=args.num_workers,
                            text_embed_fn=text_embed_fn, **cache_kw)
        # Multi-process: a trailing partial val batch (len % local_bs rows)
        # cannot be assembled into a uniformly sharded global array by
        # make_array_from_process_local_data, so drop it; per-rank index
        # shards are equal-length, keeping batch counts aligned.
        val_data = Loader(cfg, samples, val_idx, batch_size=local_bs,
                          shuffle=False, drop_last=(n_proc > 1),
                          seed=args.seed,
                          num_workers=args.num_workers,
                          text_embed_fn=text_embed_fn, **cache_kw) \
            if val_idx else None

    trainer = Trainer(cfg, train_data, val_data, workdir=args.workdir,
                      seed=args.seed, use_mesh=not args.no_mesh,
                      profile_dir=args.profile_dir,
                      multi_step=args.multi_step)
    best = trainer.fit()
    print(f"done; best val recon: {best:.4f}")
    trainer.logger.finish()


if __name__ == "__main__":
    main()
