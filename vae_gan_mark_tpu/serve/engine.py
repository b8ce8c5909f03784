"""Compiled inference engine (see package docstring)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.data.tokenizer import CharTokenizer
from vae_gan_mark_tpu.models import VAEGANGenerator
from vae_gan_mark_tpu.ops.warp import (
    perspective_crop_batch, perspective_unwarp)


class InferenceEngine:
    """Fixed-batch jitted generator serving.

    Construct from explicit variables or a Trainer checkpoint directory.
    Partial batches are padded to ``batch_size`` (static shapes on TPU) and
    sliced back.
    """

    def __init__(self, cfg: VariantConfig, g_params, g_batch_stats,
                 batch_size: int = 16, seed: int = 0,
                 text_embed_fn=None):
        self.cfg = cfg
        self.batch_size = batch_size
        self.tokenizer = CharTokenizer(cfg.alphabet, cfg.max_text_len)
        self.text_embed_fn = text_embed_fn
        self._variables = {"params": g_params, "batch_stats": g_batch_stats}
        self._model = VAEGANGenerator(cfg=cfg, train=False)
        self._rng = jax.random.PRNGKey(seed)

        def forward(variables, ru, mask, text, rng):
            recon, mu, logvar = self._model.apply(
                variables, ru, mask, text, rngs={"sample": rng})
            return recon

        self._forward = jax.jit(forward)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, cfg: VariantConfig, workdir: str,
                        name: str = "best_model", batch_size: int = 16,
                        **kwargs) -> "InferenceEngine":
        from vae_gan_mark_tpu.data.synthetic import device_batch, SyntheticPatchDataset
        from vae_gan_mark_tpu.train.checkpoint import restore_checkpoint
        from vae_gan_mark_tpu.train.state import create_train_state
        ds = SyntheticPatchDataset(cfg, num_samples=2, seed=0)
        batch = device_batch(ds.batch(2, 0))
        abstract = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        restored = restore_checkpoint(workdir, name, abstract)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint {name} in {workdir}")
        state, _ = restored
        return cls(cfg, state.g_params, state.g_batch_stats,
                   batch_size=batch_size, **kwargs)

    # ------------------------------------------------------------------
    def _encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        if self.cfg.text_encoder == "sbert":
            if self.text_embed_fn is None:
                from vae_gan_mark_tpu.data.text_embed import hash_embed
                return hash_embed(texts, self.cfg.sbert_dim)
            return np.asarray(self.text_embed_fn(list(texts)), np.float32)
        return self.tokenizer.encode(texts)

    def _pad(self, arr: np.ndarray) -> np.ndarray:
        n = arr.shape[0]
        if n == self.batch_size:
            return arr
        pad = [(0, self.batch_size - n)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad)

    def generate(self, ru: np.ndarray, mask: np.ndarray,
                 texts: Sequence[str],
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        """ru (N,H,W,3), mask (N,H,W,1) float [0,1]; returns EN patches.

        Any N: inputs are processed in fixed-size chunks (padded at the
        tail), so the compiled executable is reused for every request size.
        """
        n = ru.shape[0]
        texts = list(texts)
        rng = rng if rng is not None else self._rng
        outs = []
        for start in range(0, n, self.batch_size):
            end = min(start + self.batch_size, n)
            m = end - start
            text = self._encode_texts(
                texts[start:end] + [""] * (self.batch_size - m))
            out = self._forward(
                self._variables,
                jnp.asarray(self._pad(np.asarray(ru[start:end], np.float32))),
                jnp.asarray(self._pad(np.asarray(mask[start:end],
                                                 np.float32))),
                jnp.asarray(text), jax.random.fold_in(rng, start))
            outs.append(np.asarray(out)[:m])
        return np.concatenate(outs, axis=0)

    def render(self, image: np.ndarray, mask_image: np.ndarray,
               quad: np.ndarray, text: str,
               rng: Optional[jax.Array] = None) -> np.ndarray:
        """Full-image path: crop quad -> generate -> paste back."""
        cfg = self.cfg
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        msk = np.asarray(mask_image)
        if msk.dtype == np.uint8:
            msk = msk.astype(np.float32) / 255.0
        if msk.ndim == 2:
            msk = msk[..., None]
        quad = np.asarray(quad, np.float32)
        ru = perspective_crop_batch(jnp.asarray(img)[None],
                                    jnp.asarray(quad)[None],
                                    cfg.patch_h, cfg.patch_w)
        mk = perspective_crop_batch(jnp.asarray(msk)[None],
                                    jnp.asarray(quad)[None],
                                    cfg.patch_h, cfg.patch_w)
        patch = self.generate(np.asarray(ru), np.asarray(mk), [text],
                              rng=rng)[0]
        out = perspective_unwarp(jnp.asarray(patch), jnp.asarray(quad),
                                 jnp.asarray(img), img.shape[0],
                                 img.shape[1])
        return np.asarray(out)
