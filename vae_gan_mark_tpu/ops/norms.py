"""Normalization layers with reference (PyTorch-default) semantics.

The reference relies on ``nn.BatchNorm2d`` (eps=1e-5, momentum=0.1, unbiased
running variance), ``nn.InstanceNorm2d(affine=True)`` (no running stats), and
``torch.nn.utils.spectral_norm`` (one power iteration per forward, persisted
``u``). Flax's stock layers differ in momentum conventions and variance
estimators, so these are implemented from scratch.

All stats are computed in float32 regardless of the compute dtype so that
bfloat16 training stays numerically stable.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """BatchNorm over (N, H, W) with torch BatchNorm2d semantics.

    * training: normalize with biased batch variance, update running stats as
      ``running = (1 - momentum) * running + momentum * batch`` where the
      running variance update uses the *unbiased* batch variance (n/(n-1)),
      matching torch.
    * eval: normalize with running stats.

    Running stats live in the ``batch_stats`` collection. Under pjit-style
    data parallelism the batch mean/var are computed over the *global* batch
    (XLA inserts the cross-replica reduction automatically), i.e. sync-BN;
    the single-device reference semantics are recovered trivially on one chip.
    """

    use_running_average: bool = False
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1.0 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1.0 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True): per-sample, per-channel over (H, W).

    torch defaults: eps=1e-5, no running stats (track_running_stats=False),
    biased variance. Reference use: discriminator stages 2-4
    (/root/reference/vae-gan.py:154-156).
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        xf = x.astype(jnp.float32)
        # x: (N, H, W, C) — reduce over spatial dims only.
        reduce_axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(xf, axis=reduce_axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def spectral_normalize(kernel: jnp.ndarray, u: jnp.ndarray,
                       update: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One power-iteration step + weight normalization, torch semantics.

    ``kernel`` is an NHWC conv kernel (kh, kw, in_ch, out_ch). torch reshapes
    Conv2d weight (out, in, kh, kw) to (out, in*kh*kw) with dim=0; the
    equivalent here is moving out_ch to the front before flattening. The
    power-iteration vectors are computed under stop_gradient (torch runs it
    in no_grad), but gradients flow through the kernel in ``sigma``.

    Returns (normalized_kernel, new_u).
    """
    out_ch = kernel.shape[-1]
    w = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(out_ch, -1)
    w = w.astype(jnp.float32)
    w_sg = jax.lax.stop_gradient(w)
    if update:
        v = _l2_normalize(w_sg.T @ u)
        u_new = _l2_normalize(w_sg @ v)
    else:
        u_new = u
        v = _l2_normalize(w_sg.T @ u)
    u_sg = jax.lax.stop_gradient(u_new)
    v_sg = jax.lax.stop_gradient(v)
    sigma = jnp.einsum("i,ij,j->", u_sg, w, v_sg)
    return (kernel / sigma.astype(kernel.dtype)), u_new


class SpectralConv(nn.Module):
    """Conv2d wrapped in spectral normalization (discriminator building block).

    The power-iteration vector ``u`` persists in the ``spectral`` collection;
    each apply with ``update_sn=True`` (mutable=['spectral']) advances it one
    step, mirroring torch's per-forward update in train mode.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    update_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        # torch Conv2d default init: kaiming_uniform(a=sqrt(5)) for the kernel.
        # Exact init parity is irrelevant for a from-scratch framework; use
        # lecun_normal (flax default) for the kernel and zeros for the bias.
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params")
                                  if self.is_initializing() else
                                  jax.random.PRNGKey(0),
                                  (self.features,), jnp.float32)))
        w_sn, u_new = spectral_normalize(kernel, u_var.value,
                                         update=self.update_sn)
        if self.update_sn and not self.is_initializing():
            u_var.value = u_new
        from vae_gan_mark_tpu.ops.precision import precision_for
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_sn.astype(self.dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision_for(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)
