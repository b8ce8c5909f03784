"""Precision policy.

On TPU, float32 convolutions/matmuls run at DEFAULT precision as bf16
passes. The framework's float32 compute mode exists for parity testing
against the torch reference, so in that mode every conv/dense explicitly
requests true-f32 (HIGHEST) precision. bfloat16 mode (the production
default) keeps DEFAULT — bf16 inputs on the MXU with f32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def precision_for(dtype) -> jax.lax.Precision | None:
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)
