"""Input pipeline: host decode + warp -> device batches.

Two interchangeable loaders:

* ``HostWarpLoader`` — reference-parity path: PIL decode + cv2 homography
  warp per sample on host worker threads (what the reference's DataLoader
  workers do, vae-gan.py:267-288), then batches stream to device. Reference
  defenses are kept: any per-sample exception yields zero dummy tensors with
  empty text (vae-gan.py:284-288); a batch that loses every sample yields
  ``None`` (safe_collate, vae-gan.py:290-296).

* ``DeviceWarpLoader`` (device_pipeline.py) — TPU-first path: the host only
  decodes and crops an axis-aligned bounding box around each quad into a
  fixed-size bucket (static shapes!), and the batched perspective warp +
  normalization run on-device inside jit (ops/warp.py).

Both produce dict batches {ru, en, mask, text} with NHWC float32 in [0, 1]
and tokenized/embedded text, ready for the jitted train step.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, List, Optional, Sequence

import numpy as np

from vae_gan_mark_tpu.config import VariantConfig
from vae_gan_mark_tpu.data.index import Sample
from vae_gan_mark_tpu.data.tokenizer import CharTokenizer

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in CI images
    cv2 = None

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

# Test hook: force the native C++ warp even when cv2 exists.
_FORCE_NATIVE = bool(__import__("os").environ.get("VGM_FORCE_NATIVE_WARP"))


def _host_perspective_crop(img: np.ndarray, bbox, out_w: int,
                           out_h: int) -> np.ndarray:
    """Host warp with the reference's semantics (vae-gan.py:178-179).

    Uses cv2 when available (fastest, bit-matches the reference); otherwise
    the framework's own native C++ warp (data/native_warp.py), which agrees
    with cv2 to <=1 gray level — so the framework has no hard cv2
    dependency.
    """
    pts_src = np.asarray(bbox, np.float32).reshape(4, 2)
    if cv2 is not None and not _FORCE_NATIVE:
        pts_dst = np.array([[0, 0], [out_w - 1, 0], [out_w - 1, out_h - 1],
                            [0, out_h - 1]], np.float32)
        m = cv2.getPerspectiveTransform(pts_src, pts_dst)
        return cv2.warpPerspective(img, m, (out_w, out_h),
                                   flags=cv2.INTER_LINEAR,
                                   borderMode=cv2.BORDER_REPLICATE)
    from vae_gan_mark_tpu.data import native_warp
    if not native_warp.available():
        raise RuntimeError("neither cv2 nor the native warp library is "
                           "available (run tools/build_native.py)")
    return native_warp.perspective_crop(img, pts_src, out_w, out_h)


def load_sample(sample: Sample, cfg: VariantConfig):
    """Decode + warp one sample -> (ru, en, mask) float32 HWC in [0,1].

    Zero dummies on any failure, like the reference (vae-gan.py:284-288).
    """
    h, w = cfg.patch_h, cfg.patch_w
    try:
        ru_img = np.asarray(Image.open(sample.ru_image_path).convert("RGB"))
        if sample.en_image_path:
            en_img = np.asarray(
                Image.open(sample.en_image_path).convert("RGB"))
        else:
            en_img = np.zeros_like(ru_img)
        if sample.mask_path:
            mask_img = np.asarray(
                Image.open(sample.mask_path).convert("L"))
        else:
            mask_img = np.zeros(ru_img.shape[:2], np.uint8)

        ru = _host_perspective_crop(ru_img, sample.bbox_ru, w, h)
        if sample.bbox_en:
            en = _host_perspective_crop(en_img, sample.bbox_en, w, h)
        else:
            en = np.zeros((h, w, 3), np.uint8)
        mask = _host_perspective_crop(mask_img, sample.bbox_ru, w, h)
        return (ru.astype(np.float32) / 255.0,
                en.astype(np.float32) / 255.0,
                mask.astype(np.float32)[..., None] / 255.0,
                sample.text)
    except Exception:
        return (np.zeros((h, w, 3), np.float32),
                np.zeros((h, w, 3), np.float32),
                np.zeros((h, w, 1), np.float32),
                "")


class HostWarpLoader:
    """Epoch-callable loader over an index subset.

    ``text_embed_fn``: texts -> (B, sbert_dim) for the sbert variants; when
    None, char tokenization per the config's alphabet is used.
    """

    def __init__(self, cfg: VariantConfig, samples: Sequence[Sample],
                 indices: Sequence[int], batch_size: Optional[int] = None,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, num_workers: int = 8,
                 text_embed_fn=None, cache_dir: Optional[str] = None):
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
        self.cache = None
        if cache_dir is not None:
            # Persistent decode-once/warp-once cache: rows fill lazily on
            # first access, so epoch 0 pays the decode exactly once and
            # every later epoch streams at memmap speed instead of
            # re-decoding identical pixels (data/patch_cache.py).
            from vae_gan_mark_tpu.data.patch_cache import PatchCache
            self.cache = PatchCache(cache_dir, cfg, samples,
                                    text_embed_fn=text_embed_fn)

    def __len__(self):
        n = len(self.indices)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def _encode_text(self, texts: List[str]) -> np.ndarray:
        if self.cfg.text_encoder == "sbert":
            if self.text_embed_fn is None:
                from vae_gan_mark_tpu.data.text_embed import hash_embed
                return hash_embed(texts, self.cfg.sbert_dim)
            return np.asarray(self.text_embed_fn(texts), np.float32)
        return self.tokenizer.encode(texts)

    def __call__(self, epoch: int) -> Iterator[dict]:
        order = np.asarray(self.indices)
        if self.shuffle:
            order = np.random.default_rng(
                self.seed + epoch).permutation(order)
        b = self.batch_size
        limit = len(order) - (len(order) % b) if self.drop_last else len(order)
        if self.cache is not None:
            for start in range(0, limit, b):
                yield self.cache.batch(order[start:start + b],
                                       self.num_workers)
            return
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, limit, b):
                chunk = order[start:start + b]
                loaded = list(pool.map(
                    lambda i: load_sample(self.samples[int(i)], self.cfg),
                    chunk))
                if not loaded:
                    yield None
                    continue
                ru = np.stack([s[0] for s in loaded])
                en = np.stack([s[1] for s in loaded])
                mask = np.stack([s[2] for s in loaded])
                texts = [s[3] for s in loaded]
                yield {"ru": ru, "en": en, "mask": mask,
                       "text": self._encode_text(texts),
                       "raw_text": texts}
