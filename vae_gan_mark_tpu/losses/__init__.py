"""Loss functions (SURVEY.md §2.10) with exact reference semantics.

Weights per variant live in ``VariantConfig``; the KL term's mean-form
reduction is in ``ops.sampling.kl_divergence``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vae_gan_mark_tpu.models.vgg import vgg_features
from vae_gan_mark_tpu.ops.sampling import kl_divergence  # noqa: F401


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """nn.L1Loss() — mean absolute error (vae-gan.py:537)."""
    return jnp.mean(jnp.abs(pred.astype(jnp.float32)
                            - target.astype(jnp.float32)))


def hinge_d_real(preds: jnp.ndarray) -> jnp.ndarray:
    """relu(1 - p).mean() — discriminator on real (vae-gan.py:315-316)."""
    return jnp.mean(jnp.maximum(1.0 - preds.astype(jnp.float32), 0.0))


def hinge_d_fake(preds: jnp.ndarray) -> jnp.ndarray:
    """relu(1 + p).mean() — discriminator on fake (vae-gan.py:317-318)."""
    return jnp.mean(jnp.maximum(1.0 + preds.astype(jnp.float32), 0.0))


def hinge_g(preds: jnp.ndarray) -> jnp.ndarray:
    """-p.mean() — generator adversarial term (vae-gan.py:319-320)."""
    return -jnp.mean(preds.astype(jnp.float32))


def perceptual_loss(vgg_params, fake: jnp.ndarray, real: jnp.ndarray,
                    dtype: Any = jnp.float32) -> jnp.ndarray:
    """L1 between VGG16 relu3_3 features of fake vs real (vae-gan.py:308-311).

    The VGG weights are frozen: gradients flow through ``fake`` only (the
    caller never differentiates w.r.t. ``vgg_params``).
    """
    f = vgg_features(vgg_params, fake, dtype=dtype)
    r = vgg_features(vgg_params, real, dtype=dtype)
    return l1_loss(f, r)
