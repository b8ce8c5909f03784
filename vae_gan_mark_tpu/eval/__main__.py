"""Evaluation CLI: round-trip metrics of a trained checkpoint on a dataset.

    python -m vae_gan_mark_tpu.eval --variant v2 --workdir ./checkpoints \
        --json-dir .../all_annotations --ru-dir .../aug_ru \
        --en-dir .../aug_en --mask-dir .../masks_from_ru_bbox

Runs the full-loss validation step over the val split (the same grouped
split the trainer used: seed 42, ratio 0.1) and prints one JSON line of
sample-weighted metrics: recon L1, PSNR, masked-L1, mark-recovery,
KL/GAN/perceptual. ``--synthetic`` evaluates on the synthetic task instead
(smoke/benchmarks). These are BASELINE.json's "encode -> condition ->
decode -> compare" round-trip metrics as a standalone tool.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    from vae_gan_mark_tpu.config import VARIANTS
    p = argparse.ArgumentParser(prog="vae_gan_mark_tpu.eval",
                                description=__doc__)
    p.add_argument("--variant", choices=sorted(VARIANTS), default="v2")
    p.add_argument("--workdir", required=True)
    p.add_argument("--checkpoint", default="best_model",
                   choices=("best_model", "last_checkpoint"))
    p.add_argument("--json-dir")
    p.add_argument("--ru-dir")
    p.add_argument("--en-dir")
    p.add_argument("--mask-dir")
    p.add_argument("--patch-cache", default=None, metavar="DIR",
                   help="persistent decoded-patch cache dir (shared with "
                        "training runs)")
    p.add_argument("--shuffle-text", action="store_true",
                   help="ablation: misalign text conditioning by rolling "
                        "each batch's text rows by one — a text-using "
                        "model's masked_l1/mark_recovery must degrade vs "
                        "the true-text run (cf. tests/test_text_conditioning)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-samples", type=int, default=64)
    p.add_argument("--synthetic-text-vocab", type=int, default=0,
                   help="closed mark-string vocabulary size (must match "
                        "the training run's setting)")
    p.add_argument("--synthetic-text-tile", action="store_true",
                   help="watermark-style tiled synthetic task (must match "
                        "the training run's setting)")
    p.add_argument("--synthetic-structured", action="store_true",
                   help="smooth structured backgrounds (must match the "
                        "training run's setting)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--allow-hash-embed", action="store_true",
                   help="evaluate an sbert-variant checkpoint with the "
                        "hash_embed fallback when MiniLM is unavailable "
                        "(metrics will NOT reflect the trained model; off "
                        "by default — missing SBERT errors loudly)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    return p


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_gan_mark_tpu.cli import parse_overrides
    from vae_gan_mark_tpu.config import VariantConfig, get_config
    from vae_gan_mark_tpu.data.synthetic import SyntheticPatchDataset
    from vae_gan_mark_tpu.models.vgg import load_vgg_params
    from vae_gan_mark_tpu.train.checkpoint import restore_checkpoint
    from vae_gan_mark_tpu.train.state import create_train_state
    from vae_gan_mark_tpu.train.step import jit_eval_step

    args = build_parser().parse_args(argv)
    overrides = parse_overrides(VariantConfig, args.set)
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    cfg = get_config(args.variant, **overrides)
    bs = cfg.batch_size

    if args.synthetic:
        ds = SyntheticPatchDataset(cfg, args.synthetic_samples,
                                   seed=args.seed + 1,
                                   text_vocab=args.synthetic_text_vocab,
                                   text_tile=args.synthetic_text_tile,
                                   structured=args.synthetic_structured)
        steps = max(args.synthetic_samples // bs, 1)

        def batches():
            for i in range(steps):
                yield ds.batch(bs, i)
    else:
        if not all((args.json_dir, args.ru_dir, args.en_dir,
                    args.mask_dir)):
            raise SystemExit("--json-dir/--ru-dir/--en-dir/--mask-dir are "
                             "required without --synthetic")
        from vae_gan_mark_tpu.data.index import build_index, grouped_split
        from vae_gan_mark_tpu.data.pipeline import HostWarpLoader
        samples = build_index(args.json_dir, args.ru_dir, args.en_dir,
                              args.mask_dir)
        _, val_idx = grouped_split(samples, cfg.val_split, cfg.split_seed)
        text_embed_fn = None
        if cfg.text_encoder == "sbert":
            # Same embedder the trainer used — the hash_embed fallback
            # would silently evaluate on pseudo-embeddings, so it is
            # refused unless --allow-hash-embed opts in.
            from vae_gan_mark_tpu.data.text_embed import make_text_embedder
            text_embed_fn = make_text_embedder(
                require_sbert=not args.allow_hash_embed)
        loader = HostWarpLoader(cfg, samples, val_idx, batch_size=bs,
                                shuffle=False, drop_last=False,
                                seed=args.seed, text_embed_fn=text_embed_fn,
                                cache_dir=args.patch_cache)

        def batches():
            yield from loader(0)

    init = None
    sums, n = None, 0
    estep = jit_eval_step(cfg)
    vgg = load_vgg_params()
    rng = jax.random.PRNGKey(args.seed)
    state = None
    for i, batch in enumerate(batches()):
        if batch is None:
            continue
        if args.shuffle_text:
            batch = dict(batch)
            batch["text"] = np.roll(np.asarray(batch["text"]), 1, axis=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "raw_text"}
        if state is None:
            abstract = create_train_state(cfg, jax.random.PRNGKey(0), batch)
            restored = restore_checkpoint(args.workdir, args.checkpoint,
                                          abstract)
            if restored is None:
                raise SystemExit(
                    f"no checkpoint {args.checkpoint} in {args.workdir}")
            state, init = restored
        # The config's final KL weight, matching how the trainer's
        # full-loss validation weights loss_G after annealing completes.
        metrics, _ = estep(state, vgg, batch,
                           jax.random.fold_in(rng, i),
                           jnp.float32(cfg.kl_weight))
        b = batch["ru"].shape[0]
        weighted = jax.tree.map(lambda v: v * b, metrics)
        sums = weighted if sums is None else jax.tree.map(
            jnp.add, sums, weighted)
        n += b
    if sums is None:
        raise SystemExit("no evaluable batches")
    avg = {k: round(float(v) / n, 6) for k, v in sums.items()}
    avg["samples"] = n
    avg["checkpoint_epoch"] = init["epoch"]
    print(json.dumps(avg))


if __name__ == "__main__":
    main()
