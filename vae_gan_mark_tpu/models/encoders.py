"""VAE encoders (SURVEY.md §2.5): plain conv stack and U-Net-with-skips.

Both end in full-feature-map-sized conv heads producing (B, 1, 1, z_ch)
``mu`` and ``logvar`` — a conv whose kernel covers the whole latent grid
(vae-gan.py:57-60), i.e. a learned global pooling.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vae_gan_mark_tpu.ops.convblocks import (
    ConvBNRelu, DoubleConvBlock, max_pool_2x2)
from vae_gan_mark_tpu.ops.precision import precision_for


class _LatentHeads(nn.Module):
    """mu/logvar heads: Conv with kernel = full latent extent, VALID."""

    z_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kh, kw = h.shape[1], h.shape[2]
        mu = nn.Conv(self.z_ch, (kh, kw), padding="VALID", dtype=self.dtype,
                     precision=precision_for(self.dtype),
                     param_dtype=jnp.float32, name="mu_head")(h)
        logvar = nn.Conv(self.z_ch, (kh, kw), padding="VALID",
                         dtype=self.dtype,
                         precision=precision_for(self.dtype),
                         param_dtype=jnp.float32, name="logvar_head")(h)
        return mu, logvar


class PlainEncoder(nn.Module):
    """Stride-2 Conv+BN+ReLU stack (vae-gan.py:47-66).

    chans = (128, 256, 512, 1024) for the reference's /16 downsampling.
    """

    chans: Tuple[int, ...]
    z_ch: int = 128
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for c in self.chans:
            x = ConvBNRelu(c, kernel_size=(3, 3), strides=(2, 2),
                           use_bias=True, train=self.train,
                           dtype=self.dtype)(x)
        mu, logvar = _LatentHeads(self.z_ch, self.dtype)(x)
        return mu, logvar


class UNetEncoder(nn.Module):
    """U-Net down path (vae-gan-v2.py:152-187; 3-level oldv flavor
    vae-gan-oldv.py:187-224).

    Returns (mu, logvar, skips) with skips ordered shallow -> deep, each at
    full/2^i resolution with chans[i] channels.
    """

    chans: Tuple[int, ...]          # (64, 128, 256, 512) or (32, 64, 128)
    bottleneck_ch: int = 1024
    z_ch: int = 128
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips: List[jnp.ndarray] = []
        for i, c in enumerate(self.chans):
            x = DoubleConvBlock(c, train=self.train, dtype=self.dtype)(x)
            skips.append(x)
            x = max_pool_2x2(x)
        x = DoubleConvBlock(self.bottleneck_ch, train=self.train,
                            dtype=self.dtype)(x)
        mu, logvar = _LatentHeads(self.z_ch, self.dtype)(x)
        return mu, logvar, skips
