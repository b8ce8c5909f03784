"""Width-fold lane packing for lane-starved full-resolution convolutions.

The v5e MXU contracts over 128 lanes; the reference architecture's
full-resolution stages run 3x3 convs with 32 or 64 channels
(vae-gan-oldv.py:187-224 stage 1, vae-gan-v2.py:152-187 stage 1), leaving
most lanes idle — measured on-chip as the dominant cause of the v2/oldv MFU
gap (benchmarks/mfu_probe_r03.json, benchmarks/pack_probe_r04.json).

The fix is an EXACT repack, not an approximation: fold the width axis into
channels,

    X[n, h, q, b*C + c] = x[n, h, q*f + b, c]      (fold factor f)

which is a zero-cost reshape in NHWC. A stride-1 SAME conv on ``x`` equals a
stride-1 SAME conv on ``X`` with a block-structured kernel ``pack_kernel_3x3``
whose nonzero blocks are the original taps routed to the right (phase-in,
phase-out) pairs. Channels grow f*C (filling lanes), spatial columns shrink
by f. The packed kernel carries structural zeros (f x the logical FLOPs) but
the measured win dominates: the oldv 3x3 32ch conv at 64x448 runs 6.8x
faster at f=2 (pack_probe_r04.json).

``FoldConv`` keeps the LOGICAL kernel as its parameter — shape, name, init
and dtype identical to ``nn.Conv`` — and packs it at trace time, so the
parameter tree, checkpoints, and the torch weight porters are unchanged
whether folding is enabled or not. Gradients flow through the pack (a
scatter of slices), making the weight update equivalent to the unfolded one
up to f32 accumulation-order rounding.

STATUS — recorded rejected optimization (round 5). Through round 4 this was
wired into the models as the ``lane_fold`` config knob; the end-to-end probe
(benchmarks/fold_e2e_probe_r04.json) showed the microbench win does not
transfer to the full train step (288.0 img/s folded vs 290.4 unfolded on
oldv: XLA fuses those convs with their BN/ReLU neighbours and picks
different layouts in context), so the knob was removed from the production
config surface and the machinery lives here with the other probes
(tconv_probe, pallas_conv_probe). Exactness is still pinned by
tests/test_fold.py.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes

from vae_gan_mark_tpu.ops.precision import precision_for  # noqa: E402


def fold_width(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(N,H,W,C) -> (N,H,W/f,f*C); packed channel index = phase*C + c."""
    n, h, w, c = x.shape
    assert w % f == 0, (w, f)
    return x.reshape(n, h, w // f, f * c)


def unfold_width(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of :func:`fold_width`."""
    n, h, q, fc = x.shape
    assert fc % f == 0, (fc, f)
    return x.reshape(n, h, q * f, fc // f)


def pack_kernel_3x3(kernel: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3,3,Cin,Cout) SAME stride-1 kernel -> (3,3,f*Cin,f*Cout) packed.

    KP[dh, dq+1, b_in*Cin+ci, b_out*Cout+co] = K[dh, dw+1, ci, co] where for
    each output phase b_out and logical tap dw in {-1,0,1}: the source
    logical column is q*f + b_out + dw = (q+dq)*f + b_in with
    dq = floor((b_out+dw)/f), b_in = (b_out+dw) mod f. Every other block is
    zero. SAME padding in the folded domain reproduces the logical SAME
    zero-padding exactly (column -1 and column W both read zeros).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    kp = jnp.zeros((3, 3, f * cin, f * cout), kernel.dtype)
    for b_out in range(f):
        for dw in (-1, 0, 1):
            pos = b_out + dw
            dq, b_in = pos // f, pos % f
            kp = kp.at[:, dq + 1,
                       b_in * cin:(b_in + 1) * cin,
                       b_out * cout:(b_out + 1) * cout].set(kernel[:, dw + 1])
    return kp


class FoldConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), SAME, stride 1)`` computing in
    width-folded layout. Parameter tree (names, shapes, init) is identical
    to ``nn.Conv``; only the executed layout differs. Exactness (outputs and
    gradients) is pinned by tests/test_fold.py.
    """

    features: int
    fold: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        f = self.fold
        y = jax.lax.conv_general_dilated(
            fold_width(x, f), pack_kernel_3x3(kernel, f),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision_for(self.dtype))
        y = unfold_width(y, f)
        if bias is not None:
            y = y + bias
        return y


def fold_factor_for(folds: Tuple[int, ...], level: int, width: int) -> int:
    """Config helper: the fold factor for U-Net level ``level`` whose maps
    are ``width`` columns wide. Returns 1 (no fold) when the level has no
    entry or the width is not divisible by the requested factor.
    """
    if level >= len(folds):
        return 1
    f = int(folds[level])
    if f <= 1 or width % f != 0:
        return 1
    return f
