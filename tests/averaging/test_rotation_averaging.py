import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.averaging.rotation.averaging import (
    RotationAveraging,
    RotationAveragingOptions,
    chordal_init,
)
from gtsfm_tpu.geometry import so3
from gtsfm_tpu.utils.numerics import mm


def _make_problem(n=8, edge_prob=0.7, noise_rad=0.0, n_outliers=0, seed=0):
    """GT rotations on a random graph; relative rotations i2Ri1 = wRi2^T wRi1."""
    rng = np.random.default_rng(seed)
    wRi = np.asarray(so3.random(jax.random.PRNGKey(seed), (n,)))
    edges = []
    for i in range(n - 1):
        edges.append((i, i + 1))  # ensure connected
    for i in range(n):
        for j in range(i + 2, n):
            if rng.uniform() < edge_prob:
                edges.append((i, j))
    edges = np.array(edges, np.int32)
    i2Ri1 = np.einsum("eij,eik->ejk", wRi[edges[:, 1]], wRi[edges[:, 0]])  # R2^T R1
    if noise_rad > 0:
        pert = np.asarray(
            so3.expmap(jnp.asarray(rng.normal(0, noise_rad, (len(edges), 3)).astype(np.float32)))
        )
        i2Ri1 = np.einsum("eij,ejk->eik", i2Ri1, pert)
    if n_outliers:
        out_idx = rng.choice(len(edges), n_outliers, replace=False)
        i2Ri1[out_idx] = np.asarray(so3.random(jax.random.PRNGKey(seed + 1), (n_outliers,)))
    return wRi, edges, i2Ri1.astype(np.float32)


def _max_aligned_err_deg(wRi_est, wRi_gt):
    """Compare up to global gauge: align frame 0, measure residual angles."""
    G = wRi_gt[0] @ wRi_est[0].T
    aligned = np.einsum("ij,njk->nik", G, wRi_est)
    errs = np.asarray(so3.relative_angle_deg(jnp.asarray(aligned), jnp.asarray(wRi_gt)))
    return float(np.max(errs))


def test_chordal_init_noise_free():
    wRi_gt, edges, i2Ri1 = _make_problem(n=8)
    w = np.ones(len(edges), np.float32)
    wRi = np.asarray(chordal_init(8, jnp.asarray(edges), jnp.asarray(i2Ri1), jnp.asarray(w)))
    assert _max_aligned_err_deg(wRi, wRi_gt) < 0.1


def test_averaging_noise_free():
    wRi_gt, edges, i2Ri1 = _make_problem(n=10, seed=1)
    ra = RotationAveraging()
    wRi, valid = ra.run(10, edges, i2Ri1)
    assert np.all(valid)
    assert _max_aligned_err_deg(wRi, wRi_gt) < 0.05


def test_averaging_with_noise():
    wRi_gt, edges, i2Ri1 = _make_problem(n=12, noise_rad=0.02, seed=2)
    ra = RotationAveraging()
    wRi, valid = ra.run(12, edges, i2Ri1)
    # ~1.1 deg noise per edge should average down
    assert _max_aligned_err_deg(wRi, wRi_gt) < 2.5


def test_averaging_robust_to_outliers():
    wRi_gt, edges, i2Ri1 = _make_problem(n=12, edge_prob=0.9, noise_rad=0.01, n_outliers=4, seed=3)
    ra = RotationAveraging(RotationAveragingOptions(max_iterations=50, robust_huber_rad=0.05))
    wRi, valid = ra.run(12, edges, i2Ri1)
    assert _max_aligned_err_deg(wRi, wRi_gt) < 3.0


def test_inlier_weighting():
    wRi_gt, edges, i2Ri1 = _make_problem(n=8, noise_rad=0.03, seed=4)
    num_inliers = np.full(len(edges), 100, np.int32)
    ra = RotationAveraging()
    wRi, valid = ra.run(8, edges, i2Ri1, num_inliers=num_inliers)
    assert _max_aligned_err_deg(wRi, wRi_gt) < 3.0


def test_disconnected_cameras_marked_invalid():
    wRi_gt, edges, i2Ri1 = _make_problem(n=6, seed=5)
    # camera 6,7 exist but have no edges
    ra = RotationAveraging()
    wRi, valid = ra.run(8, edges, i2Ri1)
    assert valid[:6].all() and not valid[6:].any()
    np.testing.assert_allclose(wRi[6], np.eye(3))


def test_empty_edges():
    ra = RotationAveraging()
    wRi, valid = ra.run(4, np.zeros((0, 2), np.int32), np.zeros((0, 3, 3), np.float32))
    assert not valid.any()


def test_certification():
    from gtsfm_tpu.averaging.rotation.averaging import certify_rotation_solution

    wRi_gt, edges, i2Ri1 = _make_problem(n=8, noise_rad=0.01, seed=6)
    ra = RotationAveraging()
    w = np.ones(len(edges), np.float32)
    wRi, valid = ra.run(8, edges, i2Ri1)
    certified, min_eig = certify_rotation_solution(8, edges, i2Ri1, w, wRi)
    assert certified, min_eig
    # a garbage solution must NOT certify
    import jax

    bad = np.asarray(so3.random(jax.random.PRNGKey(99), (8,)))
    certified_bad, me_bad = certify_rotation_solution(8, edges, i2Ri1, w, bad)
    assert not certified_bad


def _make_ring(n, seed, scale=np.pi * 0.9):
    """Cycle graph with large GT rotations — adversarial for local descent."""
    rng = np.random.default_rng(seed)
    ws = rng.normal(size=(n, 3))
    ws = ws / np.linalg.norm(ws, axis=-1, keepdims=True) * rng.uniform(0.5, 1, (n, 1)) * scale
    wRi = np.asarray(so3.expmap(jnp.asarray(ws, jnp.float32)))
    edges = np.array([(i, i + 1) for i in range(n - 1)] + [(0, n - 1)], np.int32)
    i2Ri1 = np.einsum("eij,eik->ejk", wRi[edges[:, 1]], wRi[edges[:, 0]])
    return wRi, edges, i2Ri1.astype(np.float32)


def test_staircase_escapes_suboptimal_critical_point():
    """p=3 descent from identity lands in a certified-suboptimal critical
    point on this ring; the SO(p) staircase must escape to the certified
    global optimum (ShonanAveraging3 staircase parity)."""
    from gtsfm_tpu.averaging.rotation.averaging import (
        _build_cost_matrix,
        _certificate_from_G,
        _stiefel_descend,
        shonan_staircase,
    )

    n = 6
    wRi_gt, edges, i2Ri1 = _make_ring(n, seed=6)
    w = np.ones(len(edges))
    Q64 = _build_cost_matrix(n, edges, i2Ri1, w)
    G0 = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (1, n)))
    G, _ = _stiefel_descend(jnp.asarray(Q64, jnp.float32), G0, iters=300)
    stuck_cert, stuck_eig, _ = _certificate_from_G(Q64, np.asarray(G, np.float64), 1e-6)
    assert not stuck_cert and stuck_eig < -0.5  # genuinely stuck

    wRi, certified, min_eig = shonan_staircase(
        n, edges, i2Ri1, w, np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
        p_max=6, descent_iters=300,
    )
    assert certified, min_eig
    assert _max_aligned_err_deg(wRi, wRi_gt) < 0.5


def test_staircase_certifies_clean_problem_at_p3():
    """On an easy graph the staircase terminates at p=3, already certified."""
    from gtsfm_tpu.averaging.rotation.averaging import shonan_staircase

    wRi_gt, edges, i2Ri1 = _make_problem(n=8, seed=11)
    w = np.ones(len(edges))
    wRi0 = np.asarray(chordal_init(8, jnp.asarray(edges), jnp.asarray(i2Ri1), jnp.asarray(w, jnp.float32)))
    wRi, certified, min_eig = shonan_staircase(8, edges, i2Ri1, w, wRi0)
    assert certified, min_eig
    assert _max_aligned_err_deg(wRi, wRi_gt) < 0.5


def test_run_reports_certificate():
    wRi_gt, edges, i2Ri1 = _make_problem(n=8, seed=12)
    ra = RotationAveraging()
    wRi, valid = ra.run(8, edges, i2Ri1)
    assert ra.last_certified is not None and ra.last_certified[0]
    assert _max_aligned_err_deg(wRi, wRi_gt) < 0.1
