"""Adaptive average pooling with exact torch bin semantics.

``nn.AdaptiveAvgPool1d(out)`` averages input[floor(i*L/out) : ceil((i+1)*L/out)]
per output bin (used to pool BiGRU outputs over 60 chars down to W/16 = 28,
vae-gan-v2.py:83,109). Instead of a gather-per-bin loop we build a static
(L, out) averaging matrix once at trace time — the pool becomes a single
matmul, which XLA maps onto the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _adaptive_avg_matrix(in_len: int, out_len: int) -> np.ndarray:
    m = np.zeros((in_len, out_len), dtype=np.float32)
    for i in range(out_len):
        start = math.floor(i * in_len / out_len)
        end = math.ceil((i + 1) * in_len / out_len)
        m[start:end, i] = 1.0 / (end - start)
    return m


def adaptive_avg_pool1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """x: (..., L, C) pooled over L to (..., out_len, C).

    Note the channel-last layout: torch pools (B, C, L) over the last axis;
    here sequences are (B, L, C) so pooling contracts the length axis via the
    averaging matrix: out[b, o, c] = sum_l M[l, o] * x[b, l, c].
    """
    in_len = x.shape[-2]
    m = jnp.asarray(_adaptive_avg_matrix(in_len, out_len), dtype=jnp.float32)
    y = jnp.einsum("...lc,lo->...oc", x.astype(jnp.float32), m,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)
