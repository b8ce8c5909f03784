"""Text-conditioning ops: SpatialFiLM, gated skips, spatial broadcast.

* ``SpatialFiLM`` (vae-gan-v2.py:117-149): bilinearly upsamples the base text
  feature map (B, 1-or-4, W/16, C_t) to the decoder stage's (H, W), predicts
  per-pixel (gamma, beta) with Conv3x3(bias=False)+BN+ReLU+Conv1x1, and
  returns gamma * x + beta.

  TPU-first fast path (exact, not approximate): when the text map has source
  height 1 — true for the unet/v2 variants — the upsampled map is *constant
  along y*. A 3x3 conv over a y-constant map takes only three distinct
  values per column: the top row (zero-padded above), the interior rows, and
  the bottom row; each equals a 3-tap 1-D conv along x with the kernel's
  rows summed appropriately. The whole predictor therefore runs on a
  (B, 3, W, C) "row-type" tensor instead of (B, H, W, C) — a 21x FLOP
  reduction at the 64-row output stage, and the FiLM predictors are ~70% of
  the step's FLOPs at full resolution. BatchNorm statistics are computed
  with row weights (1, H-2, 1) so they equal the full-map statistics
  bit-for-associativity. Equivalence is pinned by
  tests/test_film_fast.py.

* ``GatedSkip`` (vae-gan-oldv.py:226-231): per-channel learnable gate
  ``skip * sigmoid(alpha)``, alpha initialized to 0.3.
* ``spatial_broadcast`` (vae-gan.py:118-122): tile a (B, C) embedding over a
  spatial grid.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

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

    ``x``: (B, H, W, C_main); ``text_map``: (B, h_t, w_t, C_t).
    Parameters (shared by both execution paths):
      * ``predict_kernel`` (3, 3, C_t, C_t), no bias (BN follows);
      * BatchNorm scale/bias (+ running stats in ``batch_stats``),
        torch semantics (eps 1e-5, momentum 0.1, unbiased running var);
      * ``gb_kernel`` (1, 1, C_t, 2*C_main) + ``gb_bias``.
    """

    num_features_main: int
    train: bool = True
    dtype: Any = jnp.float32
    fast: bool = True
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5

    @property
    def _precision(self):
        # float32 compute = parity mode: force true-f32 convs (TPU default
        # would silently use bf16 passes). bfloat16 compute keeps DEFAULT.
        return (jax.lax.Precision.HIGHEST
                if jnp.dtype(self.dtype) == jnp.float32 else None)

    @nn.compact
    def __call__(self, x, text_map):
        c_t = text_map.shape[-1]
        c_out = 2 * self.num_features_main
        h, w = x.shape[1], x.shape[2]

        predict_kernel = self.param(
            "predict_kernel", nn.initializers.lecun_normal(),
            (3, 3, c_t, c_t), jnp.float32)
        bn_scale = self.param("bn_scale", nn.initializers.ones, (c_t,),
                              jnp.float32)
        bn_bias = self.param("bn_bias", nn.initializers.zeros, (c_t,),
                             jnp.float32)
        ra_mean = self.variable("batch_stats", "bn_mean",
                                lambda: jnp.zeros((c_t,), jnp.float32))
        ra_var = self.variable("batch_stats", "bn_var",
                               lambda: jnp.ones((c_t,), jnp.float32))
        gb_kernel = self.param("gb_kernel", nn.initializers.lecun_normal(),
                               (1, 1, c_t, c_out), jnp.float32)
        gb_bias = self.param("gb_bias", nn.initializers.zeros, (c_out,),
                             jnp.float32)

        if self.fast and text_map.shape[1] == 1 and h >= 3:
            gamma, beta = self._fast_path(
                x, text_map, predict_kernel, bn_scale, bn_bias,
                ra_mean, ra_var, gb_kernel, gb_bias)
            # gamma/beta are (B, 3, W, C_main) row types; apply row-wise to
            # avoid materializing full-resolution gamma/beta maps.
            top = gamma[:, 0:1] * x[:, 0:1] + beta[:, 0:1]
            mid = gamma[:, 1:2] * x[:, 1:h - 1] + beta[:, 1:2]
            bot = gamma[:, 2:3] * x[:, h - 1:h] + beta[:, 2:3]
            return jnp.concatenate([top, mid, bot], axis=1)

        if self.fast and 1 < text_map.shape[1] < h:
            # Strip-factored path for taller text maps (oldv's height 4):
            # the y-upsampled map is a static linear combination of h_t
            # source strips, so conv3x3(upsample(t)) = sum over kernel rows
            # of interp-matrix @ (1-D x-conv of the strips). Exact; kills
            # the O(H*W*9*C^2) conv, keeping only O(h_t*W*3*C^2) + the
            # (bandwidth-bound) combination and the downstream 1x1.
            t = self._strip_conv(x, text_map, predict_kernel)
            t = self._batch_norm(t, bn_scale, bn_bias, ra_mean, ra_var,
                                 weights=None)
            t = nn.relu(t).astype(self.dtype)
            gb = jax.lax.conv_general_dilated(
                t, gb_kernel.astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self._precision)
            gb = (gb + gb_bias.astype(gb.dtype)).astype(self.dtype)
            gamma = gb[..., :self.num_features_main]
            beta = gb[..., self.num_features_main:]
            return gamma * x + beta

        t = interpolate_bilinear(text_map, h, w).astype(self.dtype)
        t = jax.lax.conv_general_dilated(
            t, predict_kernel.astype(self.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self._precision)
        t = self._batch_norm(t, bn_scale, bn_bias, ra_mean, ra_var,
                             weights=None)
        t = nn.relu(t).astype(self.dtype)
        gb = jax.lax.conv_general_dilated(
            t, gb_kernel.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self._precision)
        gb = (gb + gb_bias.astype(gb.dtype)).astype(self.dtype)
        gamma = gb[..., :self.num_features_main]
        beta = gb[..., self.num_features_main:]
        return gamma * x + beta

    # ------------------------------------------------------------------
    def _fast_path(self, x, text_map, predict_kernel, bn_scale, bn_bias,
                   ra_mean, ra_var, gb_kernel, gb_bias):
        """Row-factored predictor for y-constant upsampled text maps."""
        h, w = x.shape[1], x.shape[2]
        # x-only bilinear interpolation; the y-broadcast is implicit.
        t_x = interpolate_bilinear(text_map, 1, w)       # (B, 1, W, C_t)
        t_x = t_x.astype(self.dtype)
        k = predict_kernel                                # (3, 3, Ct, Ct)
        # Row-type kernels: top row is zero-padded above (kernel rows 1+2),
        # interior rows see three copies (rows 0+1+2), bottom is padded
        # below (rows 0+1). Each is a 3-tap conv along x.
        k_top = (k[1] + k[2])[None]                       # (1, 3, Ct, Ct)
        k_mid = (k[0] + k[1] + k[2])[None]
        k_bot = (k[0] + k[1])[None]
        rows = []
        for kr in (k_top, k_mid, k_bot):
            r = jax.lax.conv_general_dilated(
                t_x, kr.astype(self.dtype), (1, 1), ((0, 0), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self._precision)
            rows.append(r)
        t_rows = jnp.concatenate(rows, axis=1)            # (B, 3, W, Ct)

        t_rows = self._batch_norm(t_rows, bn_scale, bn_bias, ra_mean,
                                  ra_var, weights=(1.0, float(h - 2), 1.0))
        t_rows = nn.relu(t_rows).astype(self.dtype)
        gb = jax.lax.conv_general_dilated(
            t_rows, gb_kernel.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self._precision)
        gb = (gb + gb_bias.astype(gb.dtype)).astype(self.dtype)  # (B,3,W,2C)
        return (gb[..., :self.num_features_main],
                gb[..., self.num_features_main:])

    def _strip_conv(self, x, text_map, predict_kernel):
        """conv3x3(bilinear_upsample(text_map)) via source-strip factoring.

        The exact y-interpolation matrix W (h, h_t) is extracted by resizing
        an identity matrix with the very same resize op, so any edge/weight
        convention matches by construction. For kernel row k (offset
        k-1), the contribution to output row y is W[y+k-1] . conv_k(strips),
        zero when y+k-1 falls outside the image (the conv's zero padding).
        """
        h, w = x.shape[1], x.shape[2]
        h_t = text_map.shape[1]
        t_x = interpolate_bilinear(text_map, h_t, w)      # x-interp only
        t_x = t_x.astype(self.dtype)
        # Exact y-interp matrix via resize of the identity.
        eye = jnp.eye(h_t, dtype=jnp.float32)
        w_interp = jax.image.resize(eye, (h, h_t), method="linear",
                                    antialias=False)      # (h, h_t)
        out = None
        k = predict_kernel                                 # (3, 3, Ct, Ct)
        for ki in range(3):
            conv_k = jax.lax.conv_general_dilated(
                t_x, k[ki][None].astype(self.dtype), (1, 1),
                ((0, 0), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self._precision)                 # (B, h_t, w, Ct)
            offset = ki - 1
            # Rows of W shifted by the kernel offset, zero outside [0, h).
            a = jnp.zeros((h, h_t), jnp.float32)
            if offset == -1:
                a = a.at[1:].set(w_interp[:-1])
            elif offset == 0:
                a = w_interp
            else:
                a = a.at[:-1].set(w_interp[1:])
            contrib = jnp.einsum("hj,bjwc->bhwc", a,
                                 conv_k.astype(jnp.float32),
                                 precision=jax.lax.Precision.HIGHEST)
            out = contrib if out is None else out + contrib
        return out.astype(self.dtype)

    def _batch_norm(self, t, scale, bias, ra_mean, ra_var, weights):
        """torch-semantics BN; ``weights`` are per-row multiplicities for the
        row-factored path (stats then equal the full-map stats)."""
        tf = t.astype(jnp.float32)
        if self.train:
            if weights is None:
                n = t.shape[0] * t.shape[1] * t.shape[2]
                mean = jnp.mean(tf, axis=(0, 1, 2))
                mean_sq = jnp.mean(jnp.square(tf), axis=(0, 1, 2))
            else:
                # Row-multiplicity weights (static Python floats): stats over
                # the virtual full-resolution map.
                n = int(t.shape[0] * t.shape[2] * sum(weights))
                wvec = jnp.asarray(weights, jnp.float32)
                mean = jnp.einsum("bhwc,h->c", tf, wvec) / n
                mean_sq = jnp.einsum("bhwc,h->c", jnp.square(tf), wvec) / n
            var = mean_sq - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1.0 - self.bn_momentum) * ra_mean.value
                                 + self.bn_momentum * mean)
                ra_var.value = ((1.0 - self.bn_momentum) * ra_var.value
                                + self.bn_momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.bn_eps) * scale
        return ((tf - mean) * inv + bias).astype(self.dtype)
