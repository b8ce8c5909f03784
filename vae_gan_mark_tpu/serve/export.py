"""AOT export of the serving generator via ``jax.export`` (StableHLO).

Packages the compiled eval-mode generator as a self-contained directory
artifact so a production host can serve a trained checkpoint **without the
model code** (no flax modules, no VariantConfig — just jax + the artifact):

    generator.jaxexport   serialized ``jax.export.Exported`` (StableHLO)
    params.msgpack        raw msgpack of {"params", "batch_stats"}
    manifest.json         IO spec + text-encoding recipe for callers

The exported function is the serving core of the reference's inference
recipe (crop -> model -> paste-back, /root/reference/vae-gan.py:163-200):
``(variables, ru, mask, text, seed) -> en_patch``. The perspective warp
stages stay host-side (see ``InferenceEngine.render``); they are cheap and
shape-dynamic, while the generator is the fixed-shape compiled core that
benefits from ahead-of-time packaging. ``platforms`` records every backend
the artifact may run on (cross-platform lowering): the default covers both
CPU and TPU so one artifact serves dev hosts and v5e serving pods.

Usage::

    python -m vae_gan_mark_tpu.serve.export --variant v2 \
        --workdir ./checkpoints --out ./v2_serving_artifact

    # on the serving host (no vae_gan_mark_tpu model code needed):
    from vae_gan_mark_tpu.serve.export import ExportedGenerator
    gen = ExportedGenerator.load("./v2_serving_artifact")
    patches = gen.generate(ru, mask, ["NEW TEXT", ...])
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

EXPORT_NAME = "generator.jaxexport"
PARAMS_NAME = "params.msgpack"
MANIFEST_NAME = "manifest.json"


def _text_spec(cfg, batch_size: int) -> Tuple[Tuple[int, ...], str]:
    """Shape/dtype of the text input the generator expects."""
    if cfg.text_encoder == "sbert":
        return (batch_size, cfg.sbert_dim), "float32"
    return (batch_size, cfg.max_text_len), "int32"


def export_generator(cfg, g_params, g_batch_stats, out_dir: str,
                     batch_size: int = 16,
                     platforms: Sequence[str] = ("cpu", "tpu")) -> str:
    """Serialize the eval-mode generator + weights into ``out_dir``.

    The function is exported over abstract shapes (weights are an argument,
    not baked constants — a 60M-param generator would otherwise become
    ~240 MB of inline HLO constants and the artifact could never be
    re-targeted with a newer checkpoint).
    """
    import contextlib

    import jax
    import jax.numpy as jnp
    from flax import serialization
    from vae_gan_mark_tpu.models import VAEGANGenerator
    from vae_gan_mark_tpu.ops.rnn import force_scan

    model = VAEGANGenerator(cfg=cfg, train=False)
    variables = {"params": g_params, "batch_stats": g_batch_stats}

    def forward(variables, ru, mask, text, seed):
        recon, mu, logvar = model.apply(
            variables, ru, mask, text,
            rngs={"sample": jax.random.PRNGKey(seed)})
        return recon

    text_shape, text_dtype = _text_spec(cfg, batch_size)
    args = (
        variables,
        jnp.zeros((batch_size, cfg.patch_h, cfg.patch_w, 3), jnp.float32),
        jnp.zeros((batch_size, cfg.patch_h, cfg.patch_w, 1), jnp.float32),
        jnp.zeros(text_shape, jnp.dtype(text_dtype)),
        jnp.int32(0),
    )
    # Single-target tpu artifacts keep the fused Pallas GRU (GRULayer's
    # lax.platform_dependent dispatch prunes to it at lowering). With more
    # than one target, every platform_dependent branch is lowered for every
    # platform and the Pallas kernel has no CPU lowering — trace those with
    # the portable lax.scan GRU instead (same math, equivalence-tested).
    portable = tuple(platforms) != ("tpu",)
    with force_scan() if portable else contextlib.nullcontext():
        exported = jax.export.export(
            jax.jit(forward), platforms=list(platforms))(*args)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, EXPORT_NAME), "wb") as f:
        f.write(exported.serialize())
    # msgpack_serialize (not to_bytes) so the loader can restore WITHOUT a
    # pytree template — the artifact must be callable with no model code.
    state_np = jax.tree.map(np.asarray, variables)
    with open(os.path.join(out_dir, PARAMS_NAME), "wb") as f:
        f.write(serialization.msgpack_serialize(state_np))
    manifest = {
        "variant": cfg.name,
        "batch_size": batch_size,
        "patch_h": cfg.patch_h,
        "patch_w": cfg.patch_w,
        "text_encoder": cfg.text_encoder,
        "text_shape": list(text_shape),
        "text_dtype": text_dtype,
        "alphabet": cfg.alphabet,
        "max_text_len": cfg.max_text_len,
        "sbert_dim": cfg.sbert_dim,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "call_signature": "(variables, ru, mask, text, seed:int32) -> en",
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


class ExportedGenerator:
    """Loads and serves an exported artifact — no model code required.

    Mirrors ``InferenceEngine.generate`` semantics: any request size is
    processed in fixed ``batch_size`` chunks with tail padding, so the one
    compiled executable serves every request.
    """

    def __init__(self, exported, variables, manifest: dict):
        self._exported = exported
        self._variables = variables
        self.manifest = manifest
        self.batch_size = int(manifest["batch_size"])
        self._tokenizer = None
        if manifest["text_encoder"] != "sbert":
            from vae_gan_mark_tpu.data.tokenizer import CharTokenizer
            self._tokenizer = CharTokenizer(manifest["alphabet"],
                                            int(manifest["max_text_len"]))

    @classmethod
    def load(cls, art_dir: str) -> "ExportedGenerator":
        import jax
        from flax import serialization
        with open(os.path.join(art_dir, MANIFEST_NAME)) as f:
            manifest = json.load(f)
        with open(os.path.join(art_dir, EXPORT_NAME), "rb") as f:
            exported = jax.export.deserialize(f.read())
        with open(os.path.join(art_dir, PARAMS_NAME), "rb") as f:
            variables = serialization.msgpack_restore(f.read())
        return cls(exported, variables, manifest)

    # ------------------------------------------------------------------
    def encode_texts(self, texts: Sequence[str],
                     text_embed_fn=None) -> np.ndarray:
        if self.manifest["text_encoder"] == "sbert":
            if text_embed_fn is None:
                raise RuntimeError(
                    "this artifact was trained with SBERT text embeddings; "
                    "pass text_embed_fn (see data/text_embed.py) — refusing "
                    "to silently substitute pseudo-embeddings")
            return np.asarray(text_embed_fn(list(texts)), np.float32)
        return self._tokenizer.encode(texts)

    def call(self, ru: np.ndarray, mask: np.ndarray, text: np.ndarray,
             seed: int = 0) -> np.ndarray:
        """One fixed-shape chunk: (B,H,W,3),(B,H,W,1),text -> (B,H,W,3)."""
        import jax.numpy as jnp
        out = self._exported.call(
            self._variables, jnp.asarray(ru, jnp.float32),
            jnp.asarray(mask, jnp.float32),
            jnp.asarray(text, jnp.dtype(self.manifest["text_dtype"])),
            jnp.int32(seed))
        return np.asarray(out)

    def generate(self, ru: np.ndarray, mask: np.ndarray,
                 texts: Sequence[str], seed: int = 0,
                 text_embed_fn=None) -> np.ndarray:
        n = ru.shape[0]
        if n == 0:  # np.concatenate([]) would raise on an empty request
            h = int(self.manifest["patch_h"])
            w = int(self.manifest["patch_w"])
            return np.zeros((0, h, w, 3), np.float32)
        texts = list(texts)
        bs = self.batch_size
        outs = []
        for start in range(0, n, bs):
            end = min(start + bs, n)
            m = end - start
            text = self.encode_texts(texts[start:end] + [""] * (bs - m),
                                     text_embed_fn=text_embed_fn)
            pad = [(0, bs - m)] + [(0, 0)] * (ru.ndim - 1)
            mpad = [(0, bs - m)] + [(0, 0)] * (mask.ndim - 1)
            out = self.call(
                np.pad(np.asarray(ru[start:end], np.float32), pad),
                np.pad(np.asarray(mask[start:end], np.float32), mpad),
                text, seed=seed + start)
            outs.append(out[:m])
        return np.concatenate(outs, axis=0)


def main(argv: Optional[Sequence[str]] = None):
    import argparse
    from vae_gan_mark_tpu.cli import parse_overrides
    from vae_gan_mark_tpu.config import VARIANTS, VariantConfig, get_config

    p = argparse.ArgumentParser(
        prog="vae_gan_mark_tpu.serve.export",
        description="Export a trained checkpoint as a standalone "
                    "jax.export serving artifact")
    p.add_argument("--variant", choices=sorted(VARIANTS), default="v2")
    p.add_argument("--workdir", required=True)
    p.add_argument("--checkpoint", default="best_model",
                   choices=("best_model", "last_checkpoint"))
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    args = p.parse_args(argv)

    import jax
    from vae_gan_mark_tpu.data.synthetic import (
        SyntheticPatchDataset, device_batch)
    from vae_gan_mark_tpu.train.checkpoint import restore_checkpoint
    from vae_gan_mark_tpu.train.state import create_train_state

    cfg = get_config(args.variant, **parse_overrides(VariantConfig, args.set))
    ds = SyntheticPatchDataset(cfg, num_samples=2, seed=0)
    abstract = create_train_state(cfg, jax.random.PRNGKey(0),
                                  device_batch(ds.batch(2, 0)))
    restored = restore_checkpoint(args.workdir, args.checkpoint, abstract)
    if restored is None:
        raise SystemExit(f"no checkpoint {args.checkpoint} in {args.workdir}")
    state, _ = restored
    out = export_generator(cfg, state.g_params, state.g_batch_stats,
                           args.out, batch_size=args.batch_size,
                           platforms=tuple(args.platforms.split(",")))
    sizes = {n: os.path.getsize(os.path.join(out, n))
             for n in (EXPORT_NAME, PARAMS_NAME, MANIFEST_NAME)}
    print(f"exported {args.variant}/{args.checkpoint} -> {out} "
          f"({', '.join(f'{k}: {v/1e6:.1f} MB' for k, v in sizes.items())})")


if __name__ == "__main__":
    main()
