"""PatchGAN discriminator — byte-identical across all five reference scripts
(vae-gan.py:148-159).

spectral_norm(Conv k4 s2 p1) x4 (3->64->128->256->512), InstanceNorm(affine)
after stages 2-4, LeakyReLU(0.2); final plain Conv k4 s1 p1 -> 1-channel
patch logit map. Unconditional: sees only the 3-channel patch.

Spectral-norm power-iteration vectors live in the ``spectral`` collection;
pass ``update_sn=False`` (or don't mark 'spectral' mutable) for forwards that
must not advance them.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vae_gan_mark_tpu.ops.norms import InstanceNorm, SpectralConv
from vae_gan_mark_tpu.ops.precision import precision_for


class PatchDiscriminator(nn.Module):
    base_ch: int = 64
    update_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.base_ch
        x = SpectralConv(c, (4, 4), strides=(2, 2), update_sn=self.update_sn,
                         dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        for mult in (2, 4, 8):
            x = SpectralConv(c * mult, (4, 4), strides=(2, 2),
                             update_sn=self.update_sn, dtype=self.dtype)(x)
            x = InstanceNorm(dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    precision=precision_for(self.dtype),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x
