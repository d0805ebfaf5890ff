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


def precise(fn):
    """Trace `fn` under jax.default_matmul_precision("highest").

    Blanket full-f32 coverage for a whole solver: every dot/conv the
    function (and everything it calls) traces runs at HIGHEST precision
    unless an op requests otherwise explicitly. Point-pinning individual
    einsums (round 4) proved unauditable — one un-pinned `@` or
    jnp.linalg solve inside BA left the TPU stream converging to 0.59
    pose-AUC vs the CPU stream's 0.82+ (driver artifact BENCH_r04). Apply
    this at stage boundaries (two-view verify, averaging, triangulation,
    BA, merge); throughput-critical learned-frontend matmuls opt back
    into bf16 with an explicit precision= at their call sites.

    Apply UNDER jax.jit (jit outermost): the context is entered at trace
    time, when each dot's precision is resolved, and the jit object keeps
    its AOT surface (.lower/.trace — utils/prewarm.py relies on it).
    """
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


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
        # B is a principal submatrix of a PSD normal matrix, so unpivoted
        # elimination is stable; the unrolled solve is pure VPU arithmetic,
        # ~20x faster than batched LAPACK-style linalg.solve on TPU for the
        # 65k tiny systems a RANSAC hypothesis batch generates.
        ridge = 1e-10 * jnp.eye(n - 1, dtype=AtA.dtype)
        y = solve_psd_unrolled(B + ridge, b)
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


def solve_psd_unrolled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small (..., n, n) positive-(semi)definite A by
    fully unrolled Gauss-Jordan elimination with diagonal (complete-for-PSD)
    pivoting — n static, a Python loop of n broadcasted row updates, no
    LAPACK-style device loops. Batches of tens of thousands of tiny PSD
    systems (RANSAC hypotheses / DLT normal equations) run at VPU speed,
    ~20x faster than batched jnp.linalg.solve on TPU, while the per-step
    max-diagonal pivot keeps near-singular minimal systems as accurate as
    partial-pivoted LU (validated against the degensac plane recovery
    suite, which an unpivoted variant fails)."""
    n = A.shape[-1]
    M = jnp.concatenate([A, b[..., None]], axis=-1)  # (..., n, n+1)
    cols = jnp.arange(n)
    done = jnp.zeros(A.shape[:-2] + (n,), bool)
    for _ in range(n):
        # pivot = largest remaining diagonal magnitude (PSD: the stable pick)
        diag = jnp.abs(jnp.diagonal(M[..., :, :n], axis1=-2, axis2=-1))
        p = jnp.argmax(jnp.where(done, -1.0, diag), axis=-1)  # (...,)
        prow = jnp.take_along_axis(M, p[..., None, None], axis=-2)[..., 0, :]
        pval = jnp.take_along_axis(prow, p[..., None], axis=-1)
        pval = jnp.where(jnp.abs(pval) > 1e-30, pval, 1e-30)
        prow = prow / pval
        factors = jnp.take_along_axis(M, p[..., None, None], axis=-1)[..., 0]
        elim = M - factors[..., None] * prow[..., None, :]
        is_p = cols == p[..., None]
        M = jnp.where(is_p[..., None], prow[..., None, :], elim)
        done = done | is_p
    # M[..., :, :n] is now a permutation: row i solved variable p_i
    return einsum("...ij,...i->...j", M[..., :, :n], M[..., :, n])


def nullvec_pinned_scalarized(AtA: jnp.ndarray) -> jnp.ndarray:
    """Hypothesis-grade nullvec_pinned for big batches of tiny systems.

    Same math as nullvec_pinned (pin last coordinate, solve the leading
    (n-1, n-1) system, unpivoted), but each matrix entry is carried as its
    own (batch,) array so every vector op runs across the BATCH in lanes.
    The (..., 8, 10)-shaped alternative pads its 10-wide trailing dim to
    the 128-lane tile and wastes ~13x the VPU; this layout is the fast
    path for RANSAC hypothesis solves (tens of thousands of 9x9 systems).
    Unpivoted is fine here: minimal-sample normal matrices are generically
    well-conditioned after row normalization, and a rare bad solve just
    loses the RANSAC vote. Use nullvec_pinned for anything load-bearing.
    """
    n = AtA.shape[-1]
    m = n - 1
    # unstack: rows of [B | b] where B = AtA[:m,:m], b = -AtA[:m, m]
    M = [[AtA[..., i, j] for j in range(m)] + [-AtA[..., i, m]] for i in range(m)]
    for k in range(m):
        piv = M[k][k]
        inv = jnp.where(jnp.abs(piv) > 1e-30, 1.0 / jnp.where(piv == 0, 1.0, piv), 1e30)
        row_k = [M[k][j] * inv for j in range(m + 1)]
        for i in range(m):
            if i == k:
                M[i] = row_k
            else:
                f = M[i][k]
                M[i] = [M[i][j] - f * row_k[j] for j in range(m + 1)]
    y = jnp.stack([M[i][m] for i in range(m)], axis=-1)
    e = jnp.concatenate([y, jnp.ones(y.shape[:-1] + (1,), y.dtype)], axis=-1)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-20)


def nullvec_pinned_from_rows(A8: jnp.ndarray) -> jnp.ndarray:
    """nullvec_pinned_scalarized fed directly from the (..., 8, 9) sample
    rows: builds the 9x9 normal matrix AND solves it entirely in unstacked
    (batch,)-array lane math.

    Going through an einsum("...kr,...ks->...rs") first hands XLA tens of
    thousands of 9x9-by-8 matmuls, which pad onto 128-wide MXU tiles and
    dominate the whole RANSAC verifier (measured ~30 ms per 65k-hypothesis
    batch on v5e vs ~2 ms for this formulation). Only the entries the
    pinned solve actually reads are built: the leading 8x8 block's upper
    triangle (symmetric) and the pinned column. One iterative-refinement
    pass (residual in f32, corrected through the same elimination) keeps
    near-singular minimal systems at eigh-grade nullvector accuracy — the
    unrefined unpivoted solve drifts on ~0.25% of random hypotheses, and
    downstream RANSAC votes are chaotic to those flips."""
    m = 8
    a = [[A8[..., k, j] for j in range(9)] for k in range(m)]
    # B = AtA[:8, :8] (symmetric), b = -AtA[:8, 8]
    ent = {}
    for i in range(m):
        for j in range(i, m):
            ent[(i, j)] = sum(a[k][i] * a[k][j] for k in range(m))
    B = [[ent[(i, j)] if i <= j else ent[(j, i)] for j in range(m)] for i in range(m)]
    b = [-sum(a[k][i] * a[k][8] for k in range(m)) for i in range(m)]

    def gj_solve(rhs):
        M = [list(B[i]) + [rhs[i]] for i in range(m)]
        for k in range(m):
            piv = M[k][k]
            inv = jnp.where(
                jnp.abs(piv) > 1e-30, 1.0 / jnp.where(piv == 0, 1.0, piv), 1e30
            )
            row_k = [M[k][j] * inv for j in range(m + 1)]
            for i in range(m):
                if i == k:
                    M[i] = row_k
                else:
                    f = M[i][k]
                    M[i] = [M[i][j] - f * row_k[j] for j in range(m + 1)]
        return [M[i][m] for i in range(m)]

    y = gj_solve(b)
    # iterative refinement: y += solve(B, b - B y)
    r = [b[i] - sum(B[i][j] * y[j] for j in range(m)) for i in range(m)]
    dy = gj_solve(r)
    y = [y[i] + dy[i] for i in range(m)]
    ys = jnp.stack(y, axis=-1)
    e = jnp.concatenate([ys, jnp.ones(ys.shape[:-1] + (1,), ys.dtype)], axis=-1)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-20)


def ceil_pow2(n: int, floor: int = 1) -> int:
    """Next power of two >= max(n, floor). Shape-bucketing helper: padding
    data-dependent axes to pow2 buckets lets XLA reuse one compiled
    executable across the many differently-sized clusters of a
    hierarchical reconstruction instead of recompiling per leaf."""
    n = max(int(n), int(floor))
    return 1 << (n - 1).bit_length()
