"""Convolution building blocks (NHWC, torch-equivalent output shapes).

The reference composes three conv motifs:
  * stride-2 Conv(k3,p1) + BN + ReLU           (vanilla encoder, vae-gan.py:51-56)
  * double [Conv(k3,p1,bias=False) + BN + ReLU] (U-Net blocks, vae-gan-v2.py:171-177)
  * ConvTranspose(k4,s2,p1) / (k2,s2) + BN + ReLU (decoders, vae-gan.py:75-83,
    vae-gan-v2.py:209-230)

Transposed-conv padding here is expressed as explicit (lo, hi) pairs chosen so
that output extents match torch's formula out = (in-1)*s - 2p + k.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vae_gan_mark_tpu.ops.norms import BatchNorm
from vae_gan_mark_tpu.ops.precision import precision_for


def max_pool_2x2(x):
    """MaxPool2d(kernel_size=2, stride=2)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class ConvBNRelu(nn.Module):
    """Conv (+bias) -> BatchNorm -> ReLU."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel_size,
                    strides=self.strides,
                    padding=self.padding, use_bias=self.use_bias,
                    precision=precision_for(self.dtype),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        return nn.relu(x)


class DoubleConvBlock(nn.Module):
    """[Conv k3 p1 bias=False + BN + ReLU] x 2 — the U-Net conv block."""

    features: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = ConvBNRelu(self.features, use_bias=False, train=self.train,
                           dtype=self.dtype)(x)
        return x


class LanePaddedConv(nn.Module):
    """Conv to a sub-lane output channel count, computed at ``pad_to``
    MXU lanes and sliced back.

    The decoders' RGB output convs map 64 -> 3 channels: 3 of 128 MXU
    lanes. Measured in isolation on the v5e the naive 3-lane 1x1 conv is
    latency-pathological (benchmarks/tail_probe_r05.json: 908 ms vs 78 ms
    when padded to 8 lanes, bs=128 64x448), and it carried 4.8 ms fwd in
    the r03 step trace. This module keeps the *parameters* exactly those
    of ``nn.Conv(features)`` (same shapes, names, and init — checkpoint-
    and torch-port-compatible when given the same module name), but at
    trace time zero-pads the kernel to ``pad_to`` output columns, runs
    the conv at ``pad_to`` lanes, and slices the first ``features``
    channels. Identical math: the extra columns are zero and sliced away
    (bit-exact on CPU; on the MXU the tiling differs, so reduction order
    can shift ulps). float32 mode — the torch-parity mode — therefore
    skips the padding entirely and is bit-identical to the ``nn.Conv``
    this replaces; only the bf16 production path pays the padded lanes.
    """

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"
    pad_to: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax.lax
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        pad_to = (self.pad_to
                  if jnp.dtype(self.dtype) != jnp.float32 else self.features)
        kp = jnp.zeros((kh, kw, in_ch, pad_to), self.dtype)
        kp = kp.at[..., :self.features].set(kernel.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (1, 1), self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision_for(self.dtype))
        return y[..., :self.features] + bias.astype(self.dtype)


class TConvBNRelu(nn.Module):
    """ConvTranspose -> BatchNorm -> ReLU with torch-equivalent shapes.

    ``torch_padding`` is torch's symmetric ``padding`` argument; the explicit
    lax padding (p, p) gives out = (in-1)*s + k - 2p, identical to torch.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    torch_padding: Tuple[int, int] = (0, 0)
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TConv(self.features, self.kernel_size, self.strides,
                  self.torch_padding, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        return nn.relu(x)


class TConv(nn.Module):
    """Bare ConvTranspose with torch-equivalent output shape."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    torch_padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.torch_padding
        # flax/lax conv_transpose explicit (lo, hi) padding relates to
        # torch's symmetric padding p as lo = hi = k - 1 - p, giving
        # out = (in - 1) * s + k - 2p (verified for all kernel/stride
        # combinations used by the reference decoders).
        pad = ((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw))
        return nn.ConvTranspose(
            self.features, self.kernel_size, strides=self.strides,
            padding=pad, precision=precision_for(self.dtype),
            dtype=self.dtype, param_dtype=jnp.float32)(x)
