import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.averaging.translation.averaging import (
    TranslationAveraging,
    TranslationAveragingOptions,
    mfas_outlier_weights,
)
from gtsfm_tpu.geometry import so3


def _make_problem(n=10, edge_prob=0.8, noise=0.0, seed=0):
    """GT poses; relative direction measurements i2Ui1 (unit, in i2 frame)."""
    rng = np.random.default_rng(seed)
    wRi = np.asarray(so3.random(jax.random.PRNGKey(seed), (n,)))
    wti = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    edges = [(i, i + 1) for i in range(n - 1)]
    for i in range(n):
        for j in range(i + 2, n):
            if rng.uniform() < edge_prob:
                edges.append((i, j))
    edges = np.array(edges, np.int32)
    # i2Ui1 = wRi2^T (t_i1 - t_i2), normalized
    d_world = wti[edges[:, 0]] - wti[edges[:, 1]]
    i2Ui1 = np.einsum("eji,ej->ei", wRi[edges[:, 1]], d_world)  # R^T d
    i2Ui1 /= np.linalg.norm(i2Ui1, axis=-1, keepdims=True)
    if noise > 0:
        i2Ui1 += rng.normal(0, noise, i2Ui1.shape).astype(np.float32)
        i2Ui1 /= np.linalg.norm(i2Ui1, axis=-1, keepdims=True)
    return wRi, wti, edges, i2Ui1.astype(np.float32)


def _aligned_err(t_est, t_gt, valid):
    """Similarity-align estimated to GT positions, return max residual."""
    from gtsfm_tpu.geometry.sim3 import align_points_umeyama

    sim = align_points_umeyama(
        jnp.asarray(t_est), jnp.asarray(t_gt), weights=jnp.asarray(valid.astype(np.float32))
    )
    t_al = np.asarray(sim.transform(jnp.asarray(t_est)))
    return float(np.max(np.linalg.norm((t_al - t_gt)[valid], axis=-1)))


def test_noise_free_recovery():
    wRi, wti, edges, i2Ui1 = _make_problem(n=8, seed=0)
    ta = TranslationAveraging()
    t_est, valid, inliers = ta.run(8, edges, i2Ui1, wRi)
    assert valid.all()
    err = _aligned_err(t_est, wti, valid)
    scale = np.abs(wti).max()
    assert err < 0.02 * scale, f"err {err}"


def test_noisy_recovery():
    wRi, wti, edges, i2Ui1 = _make_problem(n=12, noise=0.01, seed=1)
    ta = TranslationAveraging()
    t_est, valid, _ = ta.run(12, edges, i2Ui1, wRi)
    err = _aligned_err(t_est, wti, valid)
    assert err < 0.5, f"err {err}"


def test_outlier_edges_rejected():
    wRi, wti, edges, i2Ui1 = _make_problem(n=10, edge_prob=0.9, seed=2)
    rng = np.random.default_rng(3)
    bad = rng.choice(len(edges), 5, replace=False)
    fake = rng.normal(size=(5, 3)).astype(np.float32)
    i2Ui1 = i2Ui1.copy()
    i2Ui1[bad] = fake / np.linalg.norm(fake, axis=-1, keepdims=True)
    ta = TranslationAveraging()
    t_est, valid, inlier_mask = ta.run(10, edges, i2Ui1, wRi)
    # most outliers rejected by 1DSfM (a 10-node graph leaves ordering
    # slack, so near-consistent corruptions can survive; the Huber solve
    # absorbs them — the scale-regime precision gate lives in
    # test_full_projection_budget_at_skydio_scale), and recovery still good
    assert inlier_mask[bad].sum() <= 3
    err = _aligned_err(t_est, wti, valid)
    assert err < 0.6, f"err {err}"


def test_mfas_flags_inconsistent_edge():
    # chain 0->1->2 along +x plus an edge claiming t_0 - t_2 > 0 (wrong sign)
    edges = np.array([[1, 0], [2, 1], [0, 2]], np.int32)  # (i, j): t_i - t_j ~ u
    dirs = np.array([[1, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32)
    # first two consistent (t1 > t0, t2 > t1); third says t0 > t2 -> cycle
    proj = np.array([[1.0, 0, 0]], np.float32)
    ow = mfas_outlier_weights(edges, dirs, 3, proj)
    assert ow.max() > 0.3  # someone must be broken
    # the minimum-weight violated set should be the single inconsistent edge
    assert np.argmax(ow) == 2


def test_empty_and_single_edge():
    ta = TranslationAveraging()
    t, valid, inl = ta.run(3, np.zeros((0, 2), np.int32), np.zeros((0, 3), np.float32), np.tile(np.eye(3), (3, 1, 1)))
    assert not valid.any()


def test_rig_hard_constraints_pin_geometry_and_scale():
    """Cameras grouped into rigs with known metric offsets: the rig-aware
    solve must (a) satisfy the intra-rig constraints EXACTLY (they are
    eliminated, not penalized) and (b) recover camera positions at metric
    scale without any similarity alignment (RigTranslationAveraging1DSFM
    parity, upgraded from soft noise models to exact elimination)."""
    rng = np.random.default_rng(4)
    n_rigs, cams_per = 4, 3
    n = n_rigs * cams_per
    wRi = np.asarray(so3.random(jax.random.PRNGKey(4), (n,)))
    body = rng.uniform(-6, 6, size=(n_rigs, 3)).astype(np.float32)
    body -= body[0]  # gauge: body 0 at origin (the solver's anchor)
    # metric rig offsets (e.g. a 0.4 m camera rig), world frame
    offsets = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32)
    rig_of = np.repeat(np.arange(n_rigs), cams_per)
    wti = body[rig_of] + offsets

    edges = []
    for a in range(n):
        for b in range(a + 1, n):
            if rig_of[a] != rig_of[b] and rng.uniform() < 0.8:
                edges.append((a, b))
    edges = np.array(edges, np.int32)
    d_world = wti[edges[:, 0]] - wti[edges[:, 1]]
    i2Ui1 = np.einsum("eji,ej->ei", wRi[edges[:, 1]], d_world)
    i2Ui1 /= np.linalg.norm(i2Ui1, axis=-1, keepdims=True)

    ta = TranslationAveraging()
    t_est, valid, _ = ta.run(
        n, edges, i2Ui1.astype(np.float32), wRi, rig_of=rig_of, rig_offsets=offsets
    )
    assert valid.all()
    # (a) intra-rig deltas are exact by construction
    for r in range(n_rigs):
        cams = np.nonzero(rig_of == r)[0]
        est_d = t_est[cams[1]] - t_est[cams[0]]
        gt_d = offsets[cams[1]] - offsets[cams[0]]
        np.testing.assert_allclose(est_d, gt_d, atol=1e-6)
    # (b) metric recovery, no alignment: anchor body0 ~ 0 in both frames
    err = np.linalg.norm(t_est - wti, axis=-1).max()
    assert err < 0.05, f"metric err {err}"


def test_full_projection_budget_at_skydio_scale():
    """The default projection-direction budget matches the reference's 2000
    (averaging_1dsfm.py:51), and at skydio-501-scale edge counts the
    threaded native MFAS sweep separates planted outliers cleanly."""
    from gtsfm_tpu.averaging.translation.averaging import (
        MAX_PROJECTION_DIRECTIONS,
        TranslationAveragingOptions,
        mfas_outlier_weights,
    )

    assert MAX_PROJECTION_DIRECTIONS == 2000
    assert TranslationAveragingOptions().num_projection_dirs == 2000

    rng = np.random.default_rng(3)
    n = 501
    # loop trajectory with lookahead-15 edges (the skydio self-hosted config)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt_t = np.stack([40 * np.cos(ang), 40 * np.sin(ang), rng.normal(0, 1, n)], 1)
    edges = np.array(
        [(i, j) for i in range(n) for j in range(i + 1, min(i + 16, n))], np.int64
    )
    dirs = gt_t[edges[:, 0]] - gt_t[edges[:, 1]]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    planted = rng.random(len(edges)) < 0.12  # corrupted direction measurements
    bad = rng.normal(size=(planted.sum(), 3))
    dirs[planted] = bad / np.linalg.norm(bad, axis=-1, keepdims=True)

    proj = rng.normal(size=(1000, 3))
    proj /= np.linalg.norm(proj, axis=-1, keepdims=True)
    w = mfas_outlier_weights(edges, dirs, n, proj)
    rejected = w > 0.125  # the reference's avg-outlier-weight threshold
    # precision/recall of planted-outlier detection
    tp = (rejected & planted).sum()
    precision = tp / max(rejected.sum(), 1)
    recall = tp / max(planted.sum(), 1)
    # ~30% of random replacement directions land near-consistent with the
    # ring geometry and are genuinely indistinguishable from inliers by a
    # 1-D ordering test, bounding recall; what matters is that the edges we
    # DO reject are overwhelmingly the planted ones (precision).
    assert precision > 0.9, (precision, recall)
    assert recall > 0.65, (precision, recall)
