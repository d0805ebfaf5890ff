"""Numerical helpers shared across the framework.

TPU matmuls default to bf16 MXU passes; small geometry matmuls (3x3 poses,
Jacobian blocks) need full f32 accuracy and gain nothing from the MXU, so
all geometry code routes through these HIGHEST-precision wrappers. Large
learned-frontend matmuls (descriptor similarity, attention) opt into bf16
explicitly at their call sites instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul for small geometry matrices."""
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum(subscripts: str, *operands) -> jnp.ndarray:
    """Full-precision einsum."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)
