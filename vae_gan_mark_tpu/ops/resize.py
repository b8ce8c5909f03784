"""Bilinear resize matching ``F.interpolate(mode='bilinear',
align_corners=False)``.

Used by SpatialFiLM to align the text feature map to each decoder stage
(vae-gan-v2.py:138-141) and by the oldv bottleneck concat
(vae-gan-oldv.py:286-291). torch never antialiases, and align_corners=False is
half-pixel-center sampling — exactly ``jax.image.resize(method='linear',
antialias=False)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize NHWC tensor spatially to (out_h, out_w)."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    y = jax.image.resize(x.astype(jnp.float32), (n, out_h, out_w, c),
                         method="linear", antialias=False)
    return y.astype(dtype)
