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
    """``cond_vocab=0`` (default) is the reference's unconditional D.

    ``cond_vocab>0`` enables an OPT-IN projection-conditional head
    (Miyato & Koyama, "cGANs with projection discriminator"): D embeds
    the conditioning text itself (token Embed+mean for char variants,
    Dense for SBERT vectors) and adds a per-location inner product
    ``<features, proj(cond)>`` to the patch logits, so realism can be
    judged *given the string*. Built because five committed runs
    (examples/vocab_run/gan007_continuation/README.md) show the
    reference's unconditional D structurally cannot reward rendering the
    correct mark; the reference itself has no such head
    (vae-gan.py:148-159), so the default stays off for parity.
    """

    base_ch: int = 64
    update_sn: bool = True
    cond_vocab: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond=None):
        c = self.base_ch
        x = SpectralConv(c, (4, 4), strides=(2, 2), update_sn=self.update_sn,
                         dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        for mult in (2, 4, 8):
            x = SpectralConv(c * mult, (4, 4), strides=(2, 2),
                             update_sn=self.update_sn, dtype=self.dtype)(x)
            x = InstanceNorm(dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        logits = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                         precision=precision_for(self.dtype),
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.cond_vocab and cond is not None:
            if jnp.issubdtype(cond.dtype, jnp.integer):
                e = nn.Embed(self.cond_vocab, 64, name="cond_embed",
                             param_dtype=jnp.float32)(cond)
                e = e.astype(self.dtype).mean(axis=1)          # (B, 64)
            else:
                e = nn.Dense(64, name="cond_dense", dtype=self.dtype,
                             param_dtype=jnp.float32)(
                                 cond.astype(self.dtype))
            proj = nn.Dense(x.shape[-1], use_bias=False, name="cond_proj",
                            dtype=self.dtype, param_dtype=jnp.float32)(e)
            # Canonical projection head: <global-mean features, proj(cond)>
            # added to every patch logit (broadcast over the logit map).
            pooled = x.mean(axis=(1, 2))                       # (B, C)
            logits = logits + jnp.einsum(
                "bc,bc->b", pooled, proj)[:, None, None, None]
        return logits
