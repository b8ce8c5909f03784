"""Text-conditioning ops: SpatialFiLM, gated skips, spatial broadcast.

* ``SpatialFiLM`` (vae-gan-v2.py:117-149): bilinearly upsamples the base text
  feature map (B, 1-or-4, W/16, 512) to the decoder stage's (H, W), predicts
  per-pixel (gamma, beta) with Conv3x3+BN+ReLU+Conv1x1, and returns
  gamma * x + beta.
* ``GatedSkip`` (vae-gan-oldv.py:226-231): per-channel learnable gate
  ``skip * sigmoid(alpha)``, alpha initialized to 0.3.
* ``spatial_broadcast`` (vae-gan.py:118-122): tile a (B, C) embedding over a
  spatial grid.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vae_gan_mark_tpu.ops.convblocks import ConvBNRelu
from vae_gan_mark_tpu.ops.resize import interpolate_bilinear


def spatial_broadcast(emb: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, C) -> (B, h, w, C) by tiling."""
    b, c = emb.shape
    return jnp.broadcast_to(emb[:, None, None, :], (b, h, w, c))


class GatedSkip(nn.Module):
    """skip * sigmoid(alpha), alpha per-channel, init 0.3."""

    alpha_init: float = 0.3

    @nn.compact
    def __call__(self, skip):
        c = skip.shape[-1]
        alpha = self.param(
            "alpha", nn.initializers.constant(self.alpha_init), (c,),
            jnp.float32)
        return skip * nn.sigmoid(alpha).astype(skip.dtype)


class SpatialFiLM(nn.Module):
    """Per-pixel feature-wise linear modulation from spatial text features.

    ``x``: (B, H, W, C_main); ``text_map``: (B, h_t, w_t, C_text).
    Returns gamma * x + beta with gamma/beta predicted from the upsampled
    text map. The conv epilogue (gamma * x + beta) is a fusible elementwise
    op; XLA folds it into the surrounding convolutions.
    """

    num_features_main: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, text_map):
        h, w = x.shape[1], x.shape[2]
        t = interpolate_bilinear(text_map, h, w)
        t = ConvBNRelu(text_map.shape[-1], use_bias=False, train=self.train,
                       dtype=self.dtype)(t)
        gb = nn.Conv(2 * self.num_features_main, (1, 1), padding="VALID",
                     dtype=self.dtype, param_dtype=jnp.float32)(t)
        gamma = gb[..., :self.num_features_main]
        beta = gb[..., self.num_features_main:]
        return gamma * x + beta
