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
