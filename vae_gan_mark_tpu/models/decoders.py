"""Decoders (SURVEY.md §2.6): plain conv-transpose stack and the unified
U-Net-style decoder covering the unet/v2/oldv variants.

The reference's ``vae-gan-unet.py`` decoder is shape-inconsistent and never
executes (SURVEY.md §2.9); the "unet" topology here is the corrected ordering
that ``vae-gan-v2.py:244-276`` established (upsample -> concat skip -> convs),
minus FiLM.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from vae_gan_mark_tpu.ops.convblocks import (
    DoubleConvBlock, LanePaddedConv, TConv, TConvBNRelu)
from vae_gan_mark_tpu.ops.film import GatedSkip, SpatialFiLM
from vae_gan_mark_tpu.ops.resize import interpolate_bilinear


class PlainDecoder(nn.Module):
    """ConvTranspose stack (vae-gan.py:68-84).

    Input: (B, 1, 1, z_ch + text_ch). First layer is a ConvTranspose whose
    kernel is the full latent extent (latent_h, latent_w) — the inverse of
    the encoder's global-conv head — then stride-2 k4 p1 transposed convs up
    to full resolution, a k3 conv to ``out_ch`` and a sigmoid.
    """

    latent_h: int
    latent_w: int
    chans: Sequence[int]            # e.g. (1024, 512, 256, 128, 64)
    out_ch: int = 3
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = TConvBNRelu(self.chans[0], (self.latent_h, self.latent_w),
                        strides=(1, 1), torch_padding=(0, 0),
                        train=self.train, dtype=self.dtype)(z)
        for c in self.chans[1:]:
            x = TConvBNRelu(c, (4, 4), strides=(2, 2), torch_padding=(1, 1),
                            train=self.train, dtype=self.dtype)(x)
        # 64->3 RGB conv at full resolution: computed lane-padded (see
        # LanePaddedConv — parameters identical to the nn.Conv it replaces,
        # module named Conv_0 to keep the checkpoint tree unchanged).
        x = LanePaddedConv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, name="Conv_0")(x)
        return nn.sigmoid(x)


class UNetStyleDecoder(nn.Module):
    """Unified U-Net decoder: ``use_film`` adds SpatialFiLM after each skip
    concat (v2/oldv), ``gated_skips`` adds per-channel learnable gates on the
    skip features (oldv).

    Inputs:
      z:        (B, 1, 1, z_ch)
      text_map: (B, h_t, w_t, text_ch) spatial text features
      skips:    shallow->deep list from ``UNetEncoder``

    Bottleneck (vae-gan-v2.py:198-204 / vae-gan-oldv.py:248-253, 286-293):
    z is broadcast across width, the text map is resized to (1, latent_w) if
    it is not already that shape, both are concatenated channel-wise, and a
    ConvTranspose with kernel (latent_h, 1) lifts the (1, latent_w) strip to
    the full (latent_h, latent_w) grid.
    """

    latent_h: int
    latent_w: int
    skip_chans: Sequence[int]       # shallow->deep, e.g. (64, 128, 256, 512)
    bottleneck_ch: int = 1024
    out_ch: int = 3
    use_film: bool = True
    gated_skips: bool = False
    fast_film: bool = True
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, text_map, skips):
        b = z.shape[0]
        z_strip = jnp.broadcast_to(
            z, (b, 1, self.latent_w, z.shape[-1]))
        if text_map.shape[1:3] != (1, self.latent_w):
            t_strip = interpolate_bilinear(text_map, 1, self.latent_w)
        else:
            t_strip = text_map
        x = jnp.concatenate([z_strip, t_strip.astype(z_strip.dtype)], axis=-1)
        x = TConvBNRelu(self.bottleneck_ch, (self.latent_h, 1),
                        strides=(1, 1), torch_padding=(0, 0),
                        train=self.train, dtype=self.dtype)(x)

        for i, c in enumerate(reversed(self.skip_chans)):
            skip = skips[len(self.skip_chans) - 1 - i]   # deep -> shallow
            x = TConv(c, (2, 2), strides=(2, 2), torch_padding=(0, 0),
                      dtype=self.dtype)(x)
            if self.gated_skips:
                skip = GatedSkip(name=f"gate{i}")(skip)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            if self.use_film:
                x = SpatialFiLM(num_features_main=x.shape[-1],
                                train=self.train, dtype=self.dtype,
                                fast=self.fast_film,
                                name=f"film{i}")(x, text_map)
            x = DoubleConvBlock(c, train=self.train, dtype=self.dtype)(x)

        # 64->3 RGB conv: lane-padded to 8 MXU lanes, sliced back (exact
        # math; tail_probe_r05.json). Named Conv_0 so the parameter tree is
        # byte-identical to the nn.Conv it replaces.
        x = LanePaddedConv(self.out_ch, (1, 1), padding="VALID",
                           dtype=self.dtype, name="Conv_0")(x)
        return nn.sigmoid(x)
