"""Numerical helper kernels vs LAPACK ground truth."""

import numpy as np

import jax
import jax.numpy as jnp

from gtsfm_tpu.utils.numerics import (
    ceil_pow2,
    nullvec_pinned,
    nullvec_pinned_from_rows,
    nullvec_pinned_scalarized,
    smallest_eigvec_power,
    solve_psd_unrolled,
)


def _align(e, ref):
    s = np.sign(np.sum(e * ref, axis=-1, keepdims=True))
    s[s == 0] = 1
    return e * s


def test_solve_psd_unrolled_matches_lapack():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(256, 8, 8)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(8, dtype=np.float32)
    b = rng.normal(size=(256, 8)).astype(np.float32)
    x = np.asarray(solve_psd_unrolled(jnp.asarray(A), jnp.asarray(b)))
    x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-4)


def test_nullvec_pinned_exact_nullspace():
    """Minimal systems with an exact nullvector recover it to f32 grade."""
    rng = np.random.default_rng(1)
    H = 512
    # build rank-8 9x9 normal matrices with a known nullvector
    null = rng.normal(size=(H, 9)).astype(np.float32)
    null /= np.linalg.norm(null, axis=-1, keepdims=True)
    rows = rng.normal(size=(H, 8, 9)).astype(np.float32)
    rows -= np.einsum("hkj,hj->hk", rows, null)[..., None] * null[:, None, :]
    AtA = jnp.asarray(np.einsum("hki,hkj->hij", rows, rows))
    for fn in (nullvec_pinned, nullvec_pinned_scalarized):
        e = np.asarray(fn(AtA))
        dots = np.abs(np.sum(e * null, axis=-1))
        # pinning the last coordinate fails only when null[8] ~ 0
        good = np.abs(null[:, 8]) > 0.05
        assert dots[good].min() > 0.999, fn.__name__
    e = np.asarray(nullvec_pinned_from_rows(jnp.asarray(rows)))
    dots = np.abs(np.sum(e * null, axis=-1))
    good = np.abs(null[:, 8]) > 0.05
    assert dots[good].min() > 0.999


def test_from_rows_agrees_with_scalarized():
    """The lane-math build+solve (TPU verifier path) matches the
    einsum-fed scalarized solve (CPU verifier path) on generic rows."""
    rng = np.random.default_rng(2)
    A8 = jnp.asarray(rng.normal(size=(1024, 8, 9)).astype(np.float32))
    AtA = jnp.einsum("hkr,hks->hrs", A8, A8)
    e_a = np.asarray(nullvec_pinned_scalarized(AtA))
    e_b = np.asarray(nullvec_pinned_from_rows(A8))
    d = np.abs(_align(e_a, e_b) - e_b).max(axis=-1)
    # identical up to float ordering on all but near-degenerate systems
    assert np.median(d) < 1e-5
    assert (d > 1e-3).mean() < 0.01


def test_smallest_eigvec_power():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(64, 6, 6)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2) + 0.01 * np.eye(6, dtype=np.float32)
    v = np.asarray(smallest_eigvec_power(jnp.asarray(A)))
    w, V = np.linalg.eigh(A.astype(np.float64))
    # accept when the spectral gap is meaningful
    gap = (w[:, 1] - w[:, 0]) / w[:, -1]
    dots = np.abs(np.sum(v * V[..., 0].astype(np.float32), axis=-1))
    assert dots[gap > 0.1].min() > 0.98


def test_ceil_pow2():
    assert ceil_pow2(1) == 1
    assert ceil_pow2(3) == 4
    assert ceil_pow2(4) == 4
    assert ceil_pow2(5, floor=16) == 16
    assert ceil_pow2(100) == 128


def test_tiny_einsum_unrolled_matches_einsum():
    """The TPU lane-math einsum unroller (bundle/ba.py) reproduces
    jnp.einsum for every spec pattern the BA solvers use."""
    from gtsfm_tpu.bundle.ba import _tiny_einsum_unrolled

    rng = np.random.default_rng(7)
    L, T, M, d = 3, 17, 29, 6
    cases = [
        ("rim,rjm->ijm", (2, d, M), (2, 3, M)),
        ("rim,rm->im", (2, 3, M), (2, M)),
        ("ijm,im->jm", (d, 3, M), (d, M)),
        ("ijt,jt->it", (3, 3, T), (3, T)),
        ("ijm,jm->im", (d, 3, M), (3, M)),
        ("jilt,jlt->ilt", (3, 3, L, T), (3, L, T)),
        ("abLt,bcLt->acLt", (2, 2, L, T), (2, 3, L, T)),
        ("abLt,cbLt->acLt", (2, 3, L, T), (3, 3, L, T)),
        ("rilt,rjlt->ijlt", (2, d, L, T), (2, 3, L, T)),
        ("rilt,rlt->ilt", (2, 3, L, T), (2, L, T)),
        ("ijlt,ilt->jlt", (d, 3, L, T), (d, L, T)),
    ]
    for spec, sa, sb in cases:
        a = jnp.asarray(rng.normal(size=sa).astype(np.float32))
        b = jnp.asarray(rng.normal(size=sb).astype(np.float32))
        got = np.asarray(_tiny_einsum_unrolled(spec, a, b))
        ref = np.asarray(jnp.einsum(spec, a, b))
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6, err_msg=spec)
