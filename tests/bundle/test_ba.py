import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
from gtsfm_tpu.geometry import SE3
from tests.common.test_sfm_data import make_synthetic_scene


def _perturb(data, pose_sigma=0.02, point_sigma=0.05, seed=0, n_anchors=1):
    rng = np.random.default_rng(seed)
    xi = rng.normal(0, pose_sigma, size=(data.max_cameras, 6)).astype(np.float32)
    # keep anchor cameras at ground truth (they may be frozen by the test)
    xi[:n_anchors] = 0
    new_poses = data.poses.retract(jnp.asarray(xi))
    pts = np.asarray(data.points) + rng.normal(0, point_sigma, size=(data.max_tracks, 3)).astype(
        np.float32
    )
    return data.replace(poses=new_poses, points=jnp.asarray(pts))


def _masked_errors(data):
    err = np.asarray(data.reprojection_errors())
    m = np.asarray(data.meas_mask)
    return err[m]


def test_ba_reduces_cost_on_perturbed_scene():
    gt = make_synthetic_scene(n_cams=5, n_tracks=50)
    noisy = _perturb(gt)
    assert np.mean(_masked_errors(noisy)) > 1.0
    ba = BundleAdjustment(BAOptions(max_iterations=25, cg_iterations=30, robust_huber_px=0.0))
    fixed = jnp.zeros(5, bool).at[0].set(True)
    opt, metrics = ba.run(noisy, fixed_cam=fixed)
    errs = _masked_errors(opt)
    assert metrics["final_cost"] < metrics["initial_cost"] * 1e-3
    assert np.mean(errs) < 0.05, f"mean reproj {np.mean(errs)}"


def test_ba_recovers_poses_up_to_gauge():
    gt = make_synthetic_scene(n_cams=5, n_tracks=60)
    noisy = _perturb(gt, pose_sigma=0.03, point_sigma=0.1, seed=1, n_anchors=2)
    ba = BundleAdjustment(BAOptions(max_iterations=30, cg_iterations=40))
    fixed = jnp.zeros(5, bool).at[0].set(True).at[1].set(True)  # full gauge fix
    opt, _ = ba.run(noisy, fixed_cam=fixed)
    # camera centers should match GT closely (gauge fully fixed by 2 cameras)
    t_err = np.abs(np.asarray(opt.poses.t) - np.asarray(gt.poses.t)).max()
    assert t_err < 0.02, f"pose center err {t_err}"


def test_ba_huber_downweights_outliers():
    gt = make_synthetic_scene(n_cams=5, n_tracks=50)
    noisy = _perturb(gt, pose_sigma=0.01, point_sigma=0.02, seed=2)
    uv = np.asarray(noisy.meas_uv).copy()
    uv[::29] += 80.0  # gross outliers in ~3% of measurements
    noisy = noisy.replace(meas_uv=jnp.asarray(uv))
    fixed = jnp.zeros(5, bool).at[0].set(True)
    robust = BundleAdjustment(BAOptions(max_iterations=30, robust_huber_px=2.0))
    opt_r, _ = robust.run(noisy, fixed_cam=fixed)
    errs = _masked_errors(opt_r)
    inlier_errs = np.delete(errs, slice(None, None, 29))
    # Huber keeps a linear tail, so outliers retain slight pull; the key
    # property is inliers converge near-perfectly while outliers stay huge.
    assert np.median(inlier_errs) < 0.25
    assert np.min(errs[::29]) > 50.0


def test_ba_fixed_cameras_do_not_move():
    gt = make_synthetic_scene(n_cams=4, n_tracks=30)
    noisy = _perturb(gt, seed=3)
    fixed = jnp.asarray([True, False, False, True])
    ba = BundleAdjustment(BAOptions(max_iterations=10))
    opt, _ = ba.run(noisy, fixed_cam=fixed)
    np.testing.assert_allclose(
        np.asarray(opt.poses.t)[[0, 3]], np.asarray(noisy.poses.t)[[0, 3]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(opt.poses.R)[[0, 3]], np.asarray(noisy.poses.R)[[0, 3]], atol=1e-6
    )


def test_ba_optimize_intrinsics():
    gt = make_synthetic_scene(n_cams=5, n_tracks=60)
    # corrupt focal lengths by 3%
    bad_cal = gt.cal.replace(f=gt.cal.f * 1.03)
    noisy = gt.replace(cal=bad_cal)  # poses/points at GT, cams 0-1 frozen
    fixed = jnp.zeros(5, bool).at[0].set(True).at[1].set(True)
    ba = BundleAdjustment(BAOptions(max_iterations=40, optimize_intrinsics=True))
    opt, metrics = ba.run(noisy, fixed_cam=fixed)
    f_rec = np.asarray(opt.cal.f)
    # frozen cameras keep their (corrupted) intrinsics; free cameras should
    # move back toward the true focal 500 (within the focal/distortion
    # near-degeneracy of small synthetic scenes)
    np.testing.assert_allclose(f_rec[:2], 515.0, atol=1e-4)
    assert np.all(np.abs(f_rec[2:] - 500.0) < 10.0)
    assert np.mean(_masked_errors(opt)) < 0.5


def test_ba_staged_filtering():
    gt = make_synthetic_scene(n_cams=5, n_tracks=50)
    noisy = _perturb(gt, pose_sigma=0.01, point_sigma=0.02, seed=4)
    uv = np.asarray(noisy.meas_uv).copy()
    uv[5] += 300.0
    noisy = noisy.replace(meas_uv=jnp.asarray(uv))
    fixed = jnp.zeros(5, bool).at[0].set(True)
    ba = BundleAdjustment(BAOptions(max_iterations=15, robust_huber_px=2.0))
    opt, stage_metrics = ba.run_staged(noisy, reproj_thresholds=(10.0, 5.0, 3.0), fixed_cam=fixed)
    assert len(stage_metrics) == 3
    # the corrupted measurement must be filtered out
    assert not bool(np.asarray(opt.meas_mask)[5])
    errs = _masked_errors(opt)
    assert np.all(errs < 3.0)


def test_ba_handles_padding():
    gt = make_synthetic_scene(n_cams=4, n_tracks=20)
    # add padding: extra dead tracks and measurements
    from gtsfm_tpu.common.sfm_data import SfmData

    padded = SfmData(
        poses=gt.poses,
        cal=gt.cal,
        pose_mask=gt.pose_mask,
        points=jnp.concatenate([gt.points, jnp.zeros((10, 3))]),
        track_mask=jnp.concatenate([gt.track_mask, jnp.zeros(10, bool)]),
        meas_cam=jnp.concatenate([gt.meas_cam, jnp.zeros(7, jnp.int32)]),
        meas_track=jnp.concatenate([gt.meas_track, jnp.zeros(7, jnp.int32)]),
        meas_uv=jnp.concatenate([gt.meas_uv, jnp.zeros((7, 2))]),
        meas_mask=jnp.concatenate([gt.meas_mask, jnp.zeros(7, bool)]),
        meta=gt.meta,
    )
    noisy = _perturb(padded, seed=5)
    fixed = jnp.zeros(4, bool).at[0].set(True)
    ba = BundleAdjustment(BAOptions(max_iterations=20))
    opt, metrics = ba.run(noisy, fixed_cam=fixed)
    assert metrics["final_cost"] < metrics["initial_cost"] * 1e-2
    assert not np.any(np.isnan(np.asarray(opt.points)))


def test_ba_gnc_rejects_gross_outliers():
    gt = make_synthetic_scene(n_cams=5, n_tracks=50)
    noisy = _perturb(gt, pose_sigma=0.01, point_sigma=0.02, seed=6)
    uv = np.asarray(noisy.meas_uv).copy()
    uv[::17] += 120.0
    noisy = noisy.replace(meas_uv=jnp.asarray(uv))
    fixed = jnp.zeros(5, bool).at[0].set(True)
    gnc = BundleAdjustment(BAOptions(max_iterations=40, robust_mode="gnc_gm", robust_huber_px=3.0))
    opt, m = gnc.run(noisy, fixed_cam=fixed)
    errs = _masked_errors(opt)
    inl = np.delete(errs, slice(None, None, 17))
    # GNC (redescending) should fully suppress outlier influence
    assert np.median(inl) < 0.1, np.median(inl)
    assert np.min(errs[::17]) > 50


def test_ba_shared_intrinsics():
    gt = make_synthetic_scene(n_cams=5, n_tracks=60)
    bad_cal = gt.cal.replace(f=gt.cal.f * 1.05)
    noisy = gt.replace(cal=bad_cal)
    fixed = jnp.zeros(5, bool)  # no frozen cams: shared cal must move all
    ba = BundleAdjustment(
        BAOptions(max_iterations=40, optimize_intrinsics=True, shared_intrinsics=True)
    )
    opt, _ = ba.run(noisy, fixed_cam=fixed)
    f_rec = np.asarray(opt.cal.f)
    # all focals identical (shared) and moved back toward 500
    assert np.ptp(f_rec) < 1e-3, f_rec
    assert abs(f_rec[0] - 500.0) < abs(525.0 - 500.0)


def test_ba_rig_between_factors():
    """Hard relative-pose constraints keep a 2-camera rig rigid under BA."""
    from gtsfm_tpu.geometry import SE3 as _SE3

    gt = make_synthetic_scene(n_cams=6, n_tracks=60)
    noisy = _perturb(gt, pose_sigma=0.03, seed=7)
    # rig pairs: (0,1), (2,3), (4,5) with GT relative poses as measurements
    edges = np.array([[0, 1], [2, 3], [4, 5]], np.int32)
    pa = jax.tree.map(lambda x: x[jnp.asarray(edges[:, 0])], gt.poses)
    pb = jax.tree.map(lambda x: x[jnp.asarray(edges[:, 1])], gt.poses)
    rel_meas = pb.inverse().compose(pa)  # bTa
    fixed = jnp.zeros(6, bool).at[0].set(True)
    ba = BundleAdjustment(BAOptions(max_iterations=30))
    opt, _ = ba.run(
        noisy, fixed_cam=fixed,
        rel_edges=jnp.asarray(edges), rel_meas=rel_meas,
        rel_weight=jnp.full(3, 1e5),
    )
    # the optimized relative poses must match the rig measurements tightly
    qa = jax.tree.map(lambda x: x[jnp.asarray(edges[:, 0])], opt.poses)
    qb = jax.tree.map(lambda x: x[jnp.asarray(edges[:, 1])], opt.poses)
    rel_est = qb.inverse().compose(qa)
    err = np.asarray(rel_meas.inverse().compose(rel_est).log())
    assert np.abs(err).max() < 2e-3, err
    # and reprojection still converged
    assert np.mean(_masked_errors(opt)) < 0.3


def test_ba_absolute_pose_priors():
    gt = make_synthetic_scene(n_cams=4, n_tracks=30)
    noisy = _perturb(gt, pose_sigma=0.05, seed=8, n_anchors=0)
    # soft priors pull every camera to GT: resolves the gauge without
    # freezing anything
    ba = BundleAdjustment(BAOptions(max_iterations=30))
    opt, _ = ba.run(
        noisy,
        prior_pose=gt.poses,
        prior_weight=jnp.full(4, 10.0),
    )
    t_err = np.abs(np.asarray(opt.poses.t) - np.asarray(gt.poses.t)).max()
    assert t_err < 0.05, t_err


def test_ba_gnc_factor_weight_filtering():
    """With gnc_weight_threshold set, annealed-away outlier measurements are
    removed from the tracks after the solve (factor-weight filtering parity)."""
    gt = make_synthetic_scene(n_cams=5, n_tracks=50)
    noisy = _perturb(gt, pose_sigma=0.01, point_sigma=0.02, seed=7)
    uv = np.asarray(noisy.meas_uv).copy()
    out_idx = np.arange(0, len(uv), 13)
    uv[out_idx] += 120.0
    noisy = noisy.replace(meas_uv=jnp.asarray(uv))
    fixed = jnp.zeros(5, bool).at[0].set(True)
    gnc = BundleAdjustment(
        BAOptions(max_iterations=40, robust_mode="gnc_gm", robust_huber_px=3.0,
                  gnc_weight_threshold=0.25)
    )
    opt, m = gnc.run(noisy, fixed_cam=fixed)
    keep = np.asarray(opt.meas_mask)
    base = np.asarray(noisy.meas_mask)
    # every corrupted measurement that was alive is now masked out
    corrupted_alive = base[out_idx]
    assert not keep[out_idx][corrupted_alive].any()
    # the vast majority of clean measurements survive
    clean = np.ones(len(uv), bool)
    clean[out_idx] = False
    survival = keep[clean & base].mean()
    assert survival > 0.95, survival
    assert m["gnc_measurements_removed"] >= corrupted_alive.sum()
    # no track shorter than 2 measurements remains
    counts = np.zeros(opt.max_tracks, int)
    np.add.at(counts, np.asarray(opt.meas_track)[keep], 1)
    tm = np.asarray(opt.track_mask)
    assert (counts[tm] >= 2).all()


def test_ba_shared_intrinsics_exact_schur_variable():
    """Shared calibration is one exact Schur variable: calibrations stay
    bit-identical across all cameras (including pose-frozen ones) and the
    shared focal converges with simultaneous pose noise."""
    gt = make_synthetic_scene(n_cams=6, n_tracks=60)
    noisy = _perturb(gt, pose_sigma=0.01, point_sigma=0.02, seed=9)
    noisy = noisy.replace(cal=noisy.cal.replace(f=noisy.cal.f * 1.06))
    fixed = jnp.zeros(6, bool).at[0].set(True)
    ba = BundleAdjustment(
        BAOptions(max_iterations=40, cg_iterations=50,
                  optimize_intrinsics=True, shared_intrinsics=True)
    )
    opt, m = ba.run(noisy, fixed_cam=fixed)
    f = np.asarray(opt.cal.f)
    # identical shared calibration everywhere, frozen camera included
    np.testing.assert_allclose(f, f[0], rtol=0, atol=0)
    # converged back toward the true focal
    f_gt = float(np.asarray(gt.cal.f)[0])
    assert abs(f[0] - f_gt) / f_gt < 0.01, f
    assert m["final_cost"] < m["initial_cost"] * 1e-2


def test_ba_karcher_gauge_without_fixed_cameras():
    """With no frozen camera, the Karcher gauge keeps the free cameras from
    drifting as a block while still converging (bundle_adjustment.py:218-254
    Karcher-mean gauge parity)."""
    gt = make_synthetic_scene(n_cams=5, n_tracks=60)
    noisy = _perturb(gt, pose_sigma=0.02, point_sigma=0.05, seed=3, n_anchors=0)
    ba = BundleAdjustment(
        BAOptions(max_iterations=25, cg_iterations=40, gauge="karcher",
                  first_point_prior_weight=10.0)
    )
    opt, metrics = ba.run(noisy, fixed_cam=jnp.zeros(5, bool))
    errs = _masked_errors(opt)
    assert metrics["final_cost"] < metrics["initial_cost"]
    assert np.mean(errs) < 0.2, f"mean reproj {np.mean(errs)}"
    # the ROTATION gauge stayed put (Karcher constrains mean rotation; the
    # reference leaves translation gauge to priors): the mean rotation
    # tangent between init and solution is near zero
    from gtsfm_tpu.geometry import so3

    dR = np.einsum("nij,nkj->nik", np.asarray(opt.poses.R), np.asarray(noisy.poses.R))
    mean_tangent = np.asarray(so3.logmap(jnp.asarray(dR))).mean(0)
    assert np.linalg.norm(mean_tangent) < 0.02, mean_tangent


def test_ba_cal_prior_keeps_intrinsics_near_init():
    """cal_prior_weight regularizes optimized intrinsics toward their
    initial values (calibration priors, bundle_adjustment.py:256-295)."""
    gt = make_synthetic_scene(n_cams=5, n_tracks=60)
    noisy = _perturb(gt, pose_sigma=0.01, point_sigma=0.02, seed=4)
    fixed = jnp.zeros(5, bool).at[0].set(True).at[1].set(True)
    f0 = np.asarray(noisy.cal.fx).copy()

    loose = BundleAdjustment(BAOptions(max_iterations=15, optimize_intrinsics=True))
    tight = BundleAdjustment(
        BAOptions(max_iterations=15, optimize_intrinsics=True, cal_prior_weight=1e4)
    )
    opt_l, _ = loose.run(noisy, fixed_cam=fixed)
    opt_t, _ = tight.run(noisy, fixed_cam=fixed)
    dev_l = np.abs(np.asarray(opt_l.cal.fx) - f0).max()
    dev_t = np.abs(np.asarray(opt_t.cal.fx) - f0).max()
    assert dev_t <= dev_l + 1e-6
    assert dev_t < 1.0  # strong prior pins focals to their start


def test_ba_layouts_agree():
    """The three inner-solve layouts (scatter segment-sum, entry-major
    cumsum/one-hot, dense Schur) solve the same normal equations: all must
    converge the same perturbed scene to the same optimum."""
    from gtsfm_tpu.bundle.ba import densify_problem, problem_from_sfm_data

    gt = make_synthetic_scene(n_cams=6, n_tracks=60)
    noisy = _perturb(gt, pose_sigma=0.02, point_sigma=0.05, seed=7)
    fixed = jnp.zeros(6, bool).at[0].set(True)
    results = {}
    for layout in ("scatter", "entry", "dense"):
        ba = BundleAdjustment(
            BAOptions(max_iterations=20, cg_iterations=40, robust_huber_px=0.0,
                      layout=layout)
        )
        opt, m = ba.run(noisy, fixed_cam=fixed)
        results[layout] = (m["final_cost"], np.asarray(opt.poses.t))
        assert m["final_cost"] < m["initial_cost"] * 1e-4, layout
    for layout in ("entry", "dense"):
        # same optimum as the scatter reference (gauge fully determined by
        # the fixed camera + identical problem)
        np.testing.assert_allclose(
            results[layout][1], results["scatter"][1], atol=5e-3
        )


def test_densify_problem_roundtrip():
    """densify_problem re-lays measurements track-major (T, L) with exact
    zero-weight padding: costs and solutions are unchanged."""
    from gtsfm_tpu.bundle.ba import (
        _cost, densify_problem, problem_from_sfm_data,
    )

    gt = make_synthetic_scene(n_cams=5, n_tracks=40)
    noisy = _perturb(gt, seed=9)
    prob = problem_from_sfm_data(noisy, fixed_cam=jnp.zeros(5, bool))
    probd, L = densify_problem(prob)
    T = noisy.max_tracks
    assert probd.meas_cam.shape[0] == T * L
    opts = BAOptions()
    c0 = float(_cost(prob, opts))
    c1 = float(_cost(probd, opts))
    np.testing.assert_allclose(c0, c1, rtol=1e-5)
    # per-track grouping: row t*L+l belongs to track t
    trk = np.asarray(probd.meas_track).reshape(T, L)
    assert (trk == np.arange(T)[:, None]).all()
    # weights preserved
    assert np.isclose(
        float(jnp.sum(prob.meas_w)), float(jnp.sum(probd.meas_w))
    )
