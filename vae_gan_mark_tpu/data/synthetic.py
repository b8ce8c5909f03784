"""Synthetic dataset for tests and benchmarks.

Generates (ru, en, mask, text) batches with a *learnable* ru->en mapping so
integration tests can assert loss decrease: the "en" patch is a deterministic
color transform of the "ru" patch inside the mask region. Texts are random
strings over the config's alphabet.
"""

from __future__ import annotations

import string

import numpy as np

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.data.tokenizer import CharTokenizer


def device_batch(batch: dict) -> dict:
    """Drop host-only keys (raw_text) and move arrays to the default device.

    For callers that feed the jitted step directly instead of going through
    ``Trainer`` (which strips host-only keys itself).
    """
    import jax.numpy as jnp
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "raw_text"}


class SyntheticPatchDataset:
    def __init__(self, cfg: VariantConfig, num_samples: int = 256,
                 seed: int = 0):
        self.cfg = cfg
        self.num_samples = num_samples
        self.rng = np.random.default_rng(seed)
        h, w = cfg.patch_h, cfg.patch_w
        self.ru = self.rng.uniform(
            0, 1, (num_samples, h, w, 3)).astype(np.float32)
        # Rectangular "text region" masks.
        self.mask = np.zeros((num_samples, h, w, 1), np.float32)
        for i in range(num_samples):
            y0 = self.rng.integers(0, h // 2)
            x0 = self.rng.integers(0, w // 2)
            self.mask[i, y0:y0 + h // 2, x0:x0 + w // 2] = 1.0
        # en = ru with channels rotated inside the mask — deterministic,
        # learnable.
        self.en = np.where(self.mask > 0, self.ru[..., [1, 2, 0]], self.ru)
        alphabet = cfg.alphabet
        printable = [c for c in alphabet if c in string.printable] or list(
            alphabet)
        self.texts = [
            "".join(self.rng.choice(printable,
                                    size=self.rng.integers(3, 20)))
            for _ in range(num_samples)]
        self.tokenizer = CharTokenizer(alphabet, cfg.max_text_len)

    def text_batch(self, idx: np.ndarray) -> np.ndarray:
        if self.cfg.text_encoder == "sbert":
            # Deterministic pseudo-embeddings keyed by text hash.
            out = np.zeros((len(idx), self.cfg.sbert_dim), np.float32)
            for row, i in enumerate(idx):
                r = np.random.default_rng(abs(hash(self.texts[i])) % (2**32))
                out[row] = r.normal(0, 1, self.cfg.sbert_dim)
            return out
        return self.tokenizer.encode([self.texts[i] for i in idx])

    def batch(self, batch_size: int, step: int = 0) -> dict:
        idx = (np.arange(batch_size) + step * batch_size) % self.num_samples
        return {
            "ru": self.ru[idx],
            "en": self.en[idx],
            "mask": self.mask[idx],
            "text": self.text_batch(idx),
            "raw_text": [self.texts[i] for i in idx],
        }
