"""Evaluation: PSNR, mark-recovery, and full-image paste-back inference.

BASELINE.json frames the task as a watermark-style "embed/extract" round
trip; the reference's real loop is encode(style) -> condition(text) ->
decode -> compare-to-GT (SURVEY.md §0 note). This module exposes exactly that
round trip:

  * ``psnr`` / ``masked_l1`` / ``mark_recovery_rate`` — patch-level metrics
    (mark recovery = fraction of masked-region pixels within a tolerance of
    the ground truth, an OCR-free proxy for "did the text render
    correctly").
  * ``render_full_image`` — crop the quad from a full image, run the
    generator, paste the generated patch back (perspective_unwarp), i.e. the
    reference's intended inference path (vae-gan.py:190-200).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vae_gan_mark_tpu.ops.warp import (
    perspective_crop_batch, perspective_unwarp)


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32)
                              - target.astype(jnp.float32)))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred-target| restricted to the text-region mask."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    m = (mask > 0.5).astype(jnp.float32)
    return jnp.sum(diff * m) / jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)


def mark_recovery_rate(pred: jnp.ndarray, target: jnp.ndarray,
                       mask: jnp.ndarray,
                       tolerance: float = 0.1) -> jnp.ndarray:
    """Fraction of masked pixels whose channel-mean abs error < tolerance."""
    err = jnp.mean(jnp.abs(pred.astype(jnp.float32)
                           - target.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    ok = (err < tolerance).astype(jnp.float32)
    m = (mask > 0.5).astype(jnp.float32)
    return jnp.sum(ok * m) / jnp.maximum(jnp.sum(m), 1.0)


def generate_patch(cfg, g_params, g_batch_stats, batch,
                   rng: Optional[jax.Array] = None):
    """Eval-mode generator forward on a prepared batch."""
    from vae_gan_mark_tpu.models import VAEGANGenerator
    model = VAEGANGenerator(cfg=cfg, train=False)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    fake, mu, logvar = model.apply(
        {"params": g_params, "batch_stats": g_batch_stats},
        batch["ru"], batch["mask"], batch["text"], rngs={"sample": rng})
    return fake, mu, logvar


def render_full_image(cfg, g_params, g_batch_stats, image, mask_image, quad,
                      text, rng: Optional[jax.Array] = None):
    """Full-image inference: crop quad -> generate -> paste back.

    image: (H, W, 3) float [0,1] or uint8; mask_image: (H, W, 1);
    quad: (4, 2) float corners; text: tokenized (L,) int32 or SBERT vector.
    Returns the full image with the region re-rendered.
    """
    h_src, w_src = image.shape[0], image.shape[1]
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    msk = jnp.asarray(mask_image, jnp.float32)
    if msk.dtype == jnp.uint8:
        msk = msk.astype(jnp.float32) / 255.0
    quad = jnp.asarray(quad, jnp.float32)
    ru = perspective_crop_batch(img[None], quad[None], cfg.patch_h,
                                cfg.patch_w)
    mk = perspective_crop_batch(msk[None], quad[None], cfg.patch_h,
                                cfg.patch_w)
    batch = {"ru": ru, "mask": mk, "text": jnp.asarray(text)[None]}
    fake, _, _ = generate_patch(cfg, g_params, g_batch_stats, batch, rng)
    return perspective_unwarp(fake[0], quad, img, h_src, w_src)
