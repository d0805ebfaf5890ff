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


def nullvec_pinned(AtA: jnp.ndarray) -> jnp.ndarray:
    """Nullvector of a rank-deficient (n, n) normal matrix by pinning the
    last coordinate to 1 and solving the leading (n-1, n-1) system.

    Exact for minimal RANSAC samples (the system has an exact nullvector);
    when the true nullvector has ~0 last coordinate the solve is ill-
    conditioned and returns a garbage hypothesis — which simply scores few
    inliers and loses the vote, the standard trade for avoiding batched
    eigh on TPU (20-100x slower than a linear solve for tiny matrices).
    For the 4x4 DLT case this uses a closed-form 3x3 adjugate inverse
    (no LAPACK loop at all).
    """
    n = AtA.shape[-1]
    B = AtA[..., : n - 1, : n - 1]
    b = -AtA[..., : n - 1, n - 1]
    if n == 4:
        y = _solve3_adjugate(B, b)
    else:
        ridge = 1e-10 * jnp.eye(n - 1, dtype=AtA.dtype)
        y = jnp.linalg.solve(B + ridge, b[..., None])[..., 0]
    e = jnp.concatenate([y, jnp.ones(y.shape[:-1] + (1,), y.dtype)], axis=-1)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-20)


def _solve3_adjugate(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form solve of (..., 3, 3) x = (..., 3) via the adjugate."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) / det
    x1 = (c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) / det
    x2 = (c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]) / det
    return jnp.stack([x0, x1, x2], axis=-1)


def smallest_eigvec_power(A: jnp.ndarray, iters: int = 60, est_iters: int = 12) -> jnp.ndarray:
    """Approximate unit eigenvector of the smallest eigenvalue of a small
    SPD matrix A (..., n, n) via shifted power iteration.

    TPU rationale: batched LAPACK-style eigh/svd on TPU run ~20-100x slower
    than plain matvec loops for tiny matrices (measured: 512x eigh(9x9)
    = 0.6s vs 40 batched matvecs = a few ms). RANSAC hypothesis solves
    don't need machine-precision nullvectors — the LO refit (exact eigh on
    a tiny batch) cleans up. Phase 1 estimates lambda_max by power
    iteration; phase 2 iterates on B = 1.01*lambda_max*I - A whose top
    eigenvector is A's bottom one.
    """
    n = A.shape[-1]
    batch = A.shape[:-2]
    # deterministic start vector (uniform-ish, unlikely to be orthogonal)
    v0 = jnp.broadcast_to(
        jnp.linspace(1.0, 2.0, n, dtype=A.dtype) / jnp.linalg.norm(jnp.linspace(1.0, 2.0, n)),
        batch + (n,),
    )

    def matvec(M, v):
        return jnp.einsum("...ij,...j->...i", M, v, precision=HIGHEST)

    def normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    # phase 1: lambda_max estimate
    def body1(v, _):
        return normalize(matvec(A, v)), None

    v, _ = jax.lax.scan(body1, v0, None, length=est_iters)
    lam_max = jnp.sum(v * matvec(A, v), axis=-1)  # Rayleigh quotient

    shift = 1.01 * lam_max[..., None, None] + 1e-12
    B = shift * jnp.eye(n, dtype=A.dtype) - A

    def body2(v, _):
        return normalize(matvec(B, v)), None

    v, _ = jax.lax.scan(body2, v0, None, length=iters)
    return v
