"""VAE reparameterization (vae-gan.py:133-136)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reparameterize(rng: jax.Array, mu: jnp.ndarray,
                   logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + exp(0.5 * logvar) * eps, eps ~ N(0, I).

    The noise is drawn in float32 regardless of compute dtype.
    """
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(rng, mu.shape, jnp.float32)
    return (mu.astype(jnp.float32) + eps * std).astype(mu.dtype)


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Mean-form KL exactly as the reference computes it (vae-gan.py:420):

    -0.5 * mean_{C,H,W}(1 + logvar - mu^2 - exp(logvar)), then batch mean.
    Note mean (not sum) over non-batch dims — the scale matters for loss
    parity.
    """
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    per_sample = -0.5 * jnp.mean(
        1.0 + logvar - jnp.square(mu) - jnp.exp(logvar),
        axis=tuple(range(1, mu.ndim)))
    return jnp.mean(per_sample)
