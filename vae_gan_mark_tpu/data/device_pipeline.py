"""TPU-first input pipeline: host decode + bucket crop, on-device warp.

The reference does the whole perspective rectification per sample on host
CPU workers (cv2, vae-gan.py:267-288). Here the host only decodes and takes
an axis-aligned crop of each quad's bounding box (plus margin) into a
fixed-size uint8 bucket — static shapes, small transfers — and the batched
homography warp + normalization runs inside one jitted call on device
(ops/warp.py). If a bounding box exceeds the bucket, the host downscales it
to fit (bilinear) and rescales the quad coordinates, so the device warp sees
an equivalent geometry.

This trades a second resampling (only for oversized regions) for a fully
static, device-resident hot path; `HostWarpLoader` (pipeline.py) remains the
bit-parity reference path, and `tests/test_device_pipeline.py` bounds the
difference between the two.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.data.index import Sample
from vae_gan_mark_tpu.data.tokenizer import CharTokenizer
from vae_gan_mark_tpu.ops.warp import perspective_crop_batch

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

BUCKET_H = 256
BUCKET_W = 1024
MARGIN = 4  # pixels of context around the bbox for bilinear taps


def bucket_crop(img: np.ndarray, quad: np.ndarray,
                bucket_h: int = BUCKET_H,
                bucket_w: int = BUCKET_W) -> Tuple[np.ndarray, np.ndarray]:
    """Crop the quad's AABB (+margin) into a (bucket_h, bucket_w) canvas.

    Returns (bucket uint8 array, adjusted quad in bucket coordinates). The
    region is top-left-aligned; oversized regions are downscaled to fit.
    Out-of-image parts of the AABB are edge-padded (matches the warp's
    BORDER_REPLICATE semantics for taps just outside the image).
    """
    h, w = img.shape[0], img.shape[1]
    chans = img.shape[2] if img.ndim == 3 else 1
    q = np.asarray(quad, np.float32)
    x0 = int(np.floor(q[:, 0].min())) - MARGIN
    x1 = int(np.ceil(q[:, 0].max())) + MARGIN
    y0 = int(np.floor(q[:, 1].min())) - MARGIN
    y1 = int(np.ceil(q[:, 1].max())) + MARGIN
    # Clip to image, keeping at least 1px.
    x0c, x1c = max(0, x0), min(w, max(x1, x0 + 1))
    y0c, y1c = max(0, y0), min(h, max(y1, y0 + 1))
    crop = img[y0c:y1c, x0c:x1c]
    if crop.ndim == 2:
        crop = crop[..., None]
    ch, cw = crop.shape[0], crop.shape[1]

    scale = min(1.0, bucket_h / ch, bucket_w / cw)
    if scale < 1.0:
        new_h = max(1, int(ch * scale))
        new_w = max(1, int(cw * scale))
        pil = Image.fromarray(crop.squeeze(-1) if chans == 1 else crop)
        pil = pil.resize((new_w, new_h), Image.BILINEAR)
        crop = np.asarray(pil)
        if crop.ndim == 2:
            crop = crop[..., None]
        ch, cw = new_h, new_w

    bucket = np.zeros((bucket_h, bucket_w, chans), np.uint8)
    bucket[:ch, :cw] = crop
    # Edge-pad so replicate-border taps outside the region see sane values.
    if ch < bucket_h:
        bucket[ch:, :cw] = crop[-1:, :]
    if cw < bucket_w:
        bucket[:, cw:] = bucket[:, cw - 1:cw]

    adj = (q - np.array([x0c, y0c], np.float32)) * scale
    return bucket, adj.astype(np.float32)


def warp_buckets(cfg: VariantConfig, ru, ru_q, en, en_q, en_valid, mask,
                 mask_q):
    """One jitted device call: warp all three streams and normalize."""
    h, w = cfg.patch_h, cfg.patch_w
    ru_p = perspective_crop_batch(ru, ru_q, h, w)
    en_p = perspective_crop_batch(en, en_q, h, w)
    en_p = jnp.where(en_valid[:, None, None, None], en_p,
                     jnp.zeros_like(en_p))
    mk_p = perspective_crop_batch(mask, mask_q, h, w)
    return ru_p, en_p, mk_p


class DeviceWarpLoader:
    """Drop-in alternative to HostWarpLoader with the warp on device."""

    def __init__(self, cfg: VariantConfig, samples: Sequence[Sample],
                 indices: Sequence[int], batch_size: Optional[int] = None,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, num_workers: int = 8,
                 text_embed_fn=None):
        self.cfg = cfg
        self.samples = samples
        self.indices = list(indices)
        self.batch_size = batch_size or cfg.batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.tokenizer = CharTokenizer(cfg.alphabet, cfg.max_text_len)
        self.text_embed_fn = text_embed_fn
        self._warp = jax.jit(
            lambda ru, ru_q, en, en_q, env, mk, mk_q: warp_buckets(
                cfg, ru, ru_q, en, en_q, env, mk, mk_q))

    def _prep_sample(self, sample: Sample):
        try:
            ru_img = np.asarray(
                Image.open(sample.ru_image_path).convert("RGB"))
            if sample.en_image_path:
                en_img = np.asarray(
                    Image.open(sample.en_image_path).convert("RGB"))
            else:
                en_img = np.zeros_like(ru_img)
            if sample.mask_path:
                mask_img = np.asarray(
                    Image.open(sample.mask_path).convert("L"))[..., None]
            else:
                mask_img = np.zeros(ru_img.shape[:2] + (1,), np.uint8)
            ru_b, ru_q = bucket_crop(ru_img, sample.bbox_ru)
            mk_b, mk_q = bucket_crop(mask_img, sample.bbox_ru)
            if sample.bbox_en:
                en_b, en_q = bucket_crop(en_img, sample.bbox_en)
                en_valid = True
            else:
                en_b = np.zeros((BUCKET_H, BUCKET_W, 3), np.uint8)
                en_q = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
                en_valid = False
            return ru_b, ru_q, en_b, en_q, en_valid, mk_b, mk_q, sample.text
        except Exception:
            zq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
            return (np.zeros((BUCKET_H, BUCKET_W, 3), np.uint8), zq,
                    np.zeros((BUCKET_H, BUCKET_W, 3), np.uint8), zq, False,
                    np.zeros((BUCKET_H, BUCKET_W, 1), np.uint8), zq, "")

    def _encode_text(self, texts: List[str]) -> np.ndarray:
        if self.cfg.text_encoder == "sbert":
            if self.text_embed_fn is None:
                from vae_gan_mark_tpu.data.text_embed import hash_embed
                return hash_embed(texts, self.cfg.sbert_dim)
            return np.asarray(self.text_embed_fn(texts), np.float32)
        return self.tokenizer.encode(texts)

    def __len__(self):
        n = len(self.indices)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def __call__(self, epoch: int) -> Iterator[dict]:
        order = np.asarray(self.indices)
        if self.shuffle:
            order = np.random.default_rng(
                self.seed + epoch).permutation(order)
        b = self.batch_size
        limit = len(order) - (len(order) % b) if self.drop_last else len(order)
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, limit, b):
                chunk = order[start:start + b]
                loaded = list(pool.map(
                    lambda i: self._prep_sample(self.samples[int(i)]), chunk))
                ru = jnp.asarray(np.stack([s[0] for s in loaded]))
                ru_q = jnp.asarray(np.stack([s[1] for s in loaded]))
                en = jnp.asarray(np.stack([s[2] for s in loaded]))
                en_q = jnp.asarray(np.stack([s[3] for s in loaded]))
                env = jnp.asarray(np.array([s[4] for s in loaded]))
                mk = jnp.asarray(np.stack([s[5] for s in loaded]))
                mk_q = jnp.asarray(np.stack([s[6] for s in loaded]))
                texts = [s[7] for s in loaded]
                ru_p, en_p, mk_p = self._warp(ru, ru_q, en, en_q, env, mk,
                                              mk_q)
                yield {"ru": ru_p, "en": en_p, "mask": mk_p,
                       "text": self._encode_text(texts),
                       "raw_text": texts}
