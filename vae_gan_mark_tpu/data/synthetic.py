"""Synthetic dataset for tests and benchmarks.

Generates (ru, en, mask, text) batches with a *learnable and
text-dependent* ru->en mapping, mirroring the reference task semantics
(/root/reference/vae-gan.py:267-288: the EN patch is the masked region
re-rendered with the target text). Concretely the "en" patch is:

  * outside the mask: the "ru" patch unchanged;
  * inside the mask: a deterministic color transform of "ru" (style
    carry-over) with the target text rasterized on top in white via a PIL
    bitmap font.

Because the glyphs depend on the text string, a model can only reach low
masked reconstruction error by actually *using* the text conditioning —
this makes text conditioning falsifiable (tests/test_text_conditioning.py
asserts both causality and trained-model dependence). Set
``text_dependent=False`` for the legacy channel-rotation-only task.
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


def render_text_tiled(text: str, h: int, w: int,
                      cell_h: int = 16) -> np.ndarray:
    """Rasterize ``text`` tiled across an (h, w) canvas, watermark-style.

    Rows every ``cell_h`` pixels, each row the string repeated at a fixed
    horizontal stride, odd rows phase-shifted by half a stride — the fixed
    absolute-position tiling of a real watermark pattern (the reference's
    marks repeat across the creative; visibility is then gated by the
    sample's mask). Deterministic; returns float32 alpha in [0, 1].
    """
    from PIL import Image, ImageDraw, ImageFont
    size = max(6, int(cell_h * 0.75))
    try:
        font = ImageFont.load_default(size=size)
    except TypeError:  # older Pillow: fixed-size raster font
        font = ImageFont.load_default()
    img = Image.new("L", (w, h), 0)
    d = ImageDraw.Draw(img)
    try:
        stride = max(int(d.textlength(text, font=font)), 8) + 12
    except AttributeError:
        stride = 7 * max(len(text), 1) + 12
    for r, y in enumerate(range(0, h, cell_h)):
        x = -(stride // 2) if r % 2 else 0
        while x < w:
            d.text((x, y), text, font=font, fill=255)
            x += stride
    return np.asarray(img, np.float32) / 255.0


def render_text_raster(text: str, mh: int, mw: int) -> np.ndarray:
    """Rasterize ``text`` into a (mh, mw) float32 alpha map in [0, 1].

    Deterministic PIL bitmap-font rendering sized to the region height —
    the synthetic stand-in for the reference's "EN creative re-rendered
    with the target text" ground truth (vae-gan.py:267-288).
    """
    from PIL import Image, ImageDraw, ImageFont
    size = max(6, int(mh * 0.6))
    try:
        font = ImageFont.load_default(size=size)
    except TypeError:  # older Pillow: fixed-size raster font
        font = ImageFont.load_default()
    img = Image.new("L", (mw, mh), 0)
    ImageDraw.Draw(img).text((2, max(0, (mh - size) // 2 - 1)), text,
                             font=font, fill=255)
    return np.asarray(img, np.float32) / 255.0


def smooth_backgrounds(rng: np.random.Generator, n: int, h: int,
                       w: int, cell: int = 16) -> np.ndarray:
    """Low-res noise bilinearly upsampled to (n, h, w, 3) in [0, 1].

    The look of the disk-run creatives (examples/disk_run/
    make_disk_dataset.py:83-86): smooth color fields rather than per-pixel
    noise. Per-pixel noise makes the PatchGAN discriminator's job degenerate
    — no generator output can match iid-noise statistics, so D wins for
    free and the hinge gradient swamps glyph learning (measured in
    examples/vocab_run/attempt2_tiled_gan). Smooth backgrounds are
    matchable, so the adversarial game carries signal.
    """
    from PIL import Image
    coarse = rng.uniform(40, 215, (n, max(h // cell, 2),
                                   max(w // cell, 2), 3))
    out = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        img = Image.fromarray(coarse[i].astype(np.uint8))
        out[i] = np.asarray(img.resize((w, h), Image.BILINEAR),
                            np.float32) / 255.0
    return out


class SyntheticPatchDataset:
    def __init__(self, cfg: VariantConfig, num_samples: int = 256,
                 seed: int = 0, text_dependent: bool = True,
                 texts: list = None, text_vocab: int = 0,
                 text_tile: bool = False, structured: bool = False):
        self.cfg = cfg
        self.num_samples = num_samples
        self.rng = np.random.default_rng(seed)
        h, w = cfg.patch_h, cfg.patch_w
        if structured:
            self.ru = smooth_backgrounds(self.rng, num_samples, h, w)
        else:
            self.ru = self.rng.uniform(
                0, 1, (num_samples, h, w, 3)).astype(np.float32)
        # Rectangular "text region" masks.
        self.mask = np.zeros((num_samples, h, w, 1), np.float32)
        boxes = []
        for i in range(num_samples):
            y0 = int(self.rng.integers(0, h // 2))
            x0 = int(self.rng.integers(0, w // 2))
            self.mask[i, y0:y0 + h // 2, x0:x0 + w // 2] = 1.0
            boxes.append((y0, x0))
        alphabet = cfg.alphabet
        printable = [c for c in alphabet if c in string.printable
                     and c != " "] or list(alphabet)
        if texts is not None:
            assert len(texts) == num_samples
            self.texts = list(texts)
        elif text_vocab > 0:
            # Closed mark vocabulary, shared across dataset seeds: real
            # watermark corpora repeat a limited set of mark strings
            # (the reference task re-renders known marks, not arbitrary
            # text), and a shared train/val vocab makes run-scale
            # conditioning learnable AND falsifiable — val images are
            # novel (different seed), so low masked error on them is only
            # reachable by reading the conditioning input, never by
            # memorizing image->glyph pairs.
            vocab_rng = np.random.default_rng(0x5EED + text_vocab)
            vocab = [
                "".join(vocab_rng.choice(printable,
                                         size=vocab_rng.integers(3, 20)))
                for _ in range(text_vocab)]
            self.texts = [vocab[int(self.rng.integers(0, text_vocab))]
                          for _ in range(num_samples)]
        else:
            self.texts = [
                "".join(self.rng.choice(printable,
                                        size=self.rng.integers(3, 20)))
                for _ in range(num_samples)]
        # en = ru with channels rotated inside the mask (style carry-over),
        # plus — when text_dependent — the target text rendered in white
        # inside the mask so the GT actually depends on the conditioning.
        self.en = np.where(self.mask > 0, self.ru[..., [1, 2, 0]], self.ru)
        if text_dependent and text_tile:
            # Watermark-style task: the string is tiled at fixed ABSOLUTE
            # positions across the whole patch (render_text_tiled) and made
            # visible only inside the mask. Glyph pixels then cover ~25-35%
            # of the masked region (vs ~5% for the single boxed line below),
            # so conditioning on the right string dominates masked error —
            # the run-scale demonstrability fix motivated by the
            # examples/vocab_run ablation analysis. Rasters are cached per
            # unique string (closed vocabularies reuse a handful).
            rasters = {}
            for i in range(num_samples):
                t = self.texts[i]
                if t not in rasters:
                    rasters[t] = render_text_tiled(t, h, w)[..., None]
                g = rasters[t] * self.mask[i]
                self.en[i] = self.en[i] * (1.0 - g) + g
        elif text_dependent:
            mh, mw = h // 2, w // 2
            for i, (y0, x0) in enumerate(boxes):
                g = render_text_raster(self.texts[i], mh, mw)[..., None]
                region = self.en[i, y0:y0 + mh, x0:x0 + mw]
                self.en[i, y0:y0 + mh, x0:x0 + mw] = (
                    region * (1.0 - g) + g)
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
