import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.geometry import SE3, so3
from gtsfm_tpu.geometry.sim3 import Sim3
from gtsfm_tpu.merging.merge import (
    MergeOptions,
    concatenate_scenes,
    merge_children,
    sim3_from_point_pairs,
)
from tests.common.test_sfm_data import make_synthetic_scene


def _split_scene(n_cams=6, n_tracks=60):
    """One GT scene split into two halves over disjoint camera sets, with
    the second half moved by a known Sim3 (simulating an independent
    reconstruction gauge). Shared tracks exist in both halves."""
    full = make_synthetic_scene(n_cams=n_cams, n_tracks=n_tracks)
    half = n_cams // 2
    mask_a = np.arange(n_cams) < half

    def restrict(data, cam_keep):
        keep_meas = np.asarray(data.meas_mask) & cam_keep[np.asarray(data.meas_cam)]
        counts = np.zeros(data.max_tracks, np.int32)
        np.add.at(counts, np.asarray(data.meas_track)[keep_meas], 1)
        keep_track = np.asarray(data.track_mask) & (counts >= 2)
        keep_meas &= keep_track[np.asarray(data.meas_track)]
        return data.replace(
            pose_mask=jnp.asarray(cam_keep),
            track_mask=jnp.asarray(keep_track),
            meas_mask=jnp.asarray(keep_meas),
        )

    data_a = restrict(full, mask_a)
    data_b = restrict(full, ~mask_a)
    # move b into its own gauge by a known Sim3
    S = Sim3(
        R=so3.random(jax.random.PRNGKey(3)),
        t=jnp.asarray([2.0, -1.0, 0.5]),
        s=jnp.asarray(np.float32(1.8)),
    )
    data_b = data_b.transform(S)
    return full, data_a, data_b, S


def _shared_track_pairs(data_a, data_b):
    """Tracks alive in both halves give 3D-3D pairs (a point, b point)."""
    ta = np.asarray(data_a.track_mask)
    tb = np.asarray(data_b.track_mask)
    shared = np.nonzero(ta & tb)[0]
    pa = np.asarray(data_a.points)[shared]
    pb = np.asarray(data_b.points)[shared]
    return pa, pb, shared, shared


def test_sim3_from_point_pairs_recovers_transform():
    full, data_a, data_b, S = _split_scene()
    pa, pb, ta, tb = _shared_track_pairs(data_a, data_b)
    assert len(pa) >= 10
    sim, inl, ok = sim3_from_point_pairs(pa, pb)
    assert ok
    S_inv = S.inverse()
    assert abs(float(sim.s) - float(S_inv.s)) < 1e-3
    np.testing.assert_allclose(np.asarray(sim.t), np.asarray(S_inv.t), atol=1e-2)


def test_sim3_robust_to_outlier_pairs():
    full, data_a, data_b, S = _split_scene(n_tracks=80)
    pa, pb, ta, tb = _shared_track_pairs(data_a, data_b)
    pb = pb.copy()
    pb[:4] += 30.0  # gross outliers
    sim, inl, ok = sim3_from_point_pairs(pa, pb)
    assert ok
    assert not inl[:4].any()
    assert abs(float(sim.s) - 1.0 / 1.8) < 5e-3


def test_merge_children_end_to_end():
    full, data_a, data_b, S = _split_scene()
    pa, pb, ta, tb = _shared_track_pairs(data_a, data_b)
    merged, metrics = merge_children(data_a, data_b, (pa, pb, ta, tb), MergeOptions())
    assert merged is not None, metrics
    assert merged.number_images() == 6
    # merged scene should reproject well everywhere
    err = np.asarray(merged.reprojection_errors())
    m = np.asarray(merged.meas_mask)
    assert np.median(err[m]) < 1.0, np.median(err[m])
    # camera poses of the b half should align with the original GT (frame a)
    t_err = np.abs(np.asarray(merged.poses.t)[3:] - np.asarray(full.poses.t)[3:]).max()
    assert t_err < 0.15, t_err
    # fused duplicate tracks: merged count < sum of parts
    assert metrics["merged_tracks"] < data_a.number_tracks() + data_b.number_tracks()


def test_concatenate_rejects_overlapping_cameras():
    full, data_a, data_b, S = _split_scene()
    import pytest

    with pytest.raises(AssertionError):
        concatenate_scenes(data_a, data_a, Sim3.identity())


def test_lmeds_batched_many_nodes_timing():
    """Deep-tree regime (VERDICT r3 #9): a depth-4 tree has ~15 merge nodes,
    each needing a robust Sim3. The LMedS+IRLS is one fused device program
    with a pow2-bucketed pair axis, so node sizes in the same bucket share
    an executable — 15 alignments (40% gross outliers each) must run in a
    few seconds, not 15 x 72 device round trips."""
    import time

    from gtsfm_tpu.geometry.sim3 import Sim3 as _S

    rng = np.random.default_rng(5)
    sizes = [100, 130, 190, 250, 300, 380, 470, 500,
             90, 140, 210, 260, 330, 410, 480]  # 15 nodes, 2 buckets mostly

    def run_node(n, seed):
        r = np.random.default_rng(seed)
        pa = r.uniform(-5, 5, (n, 3)).astype(np.float32)
        ang = 0.7
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        s_gt, t_gt = 1.7, np.array([2.0, -1.0, 0.5], np.float32)
        pb = ((pa - t_gt) @ R) / s_gt  # inverse of p_a = s R p_b + t
        out = r.random(n) < 0.4
        pb[out] = r.uniform(-20, 20, (out.sum(), 3))
        sim, inl, ok = sim3_from_point_pairs(pa, pb, MergeOptions())
        assert ok
        err = np.linalg.norm(
            np.asarray(sim.transform(jnp.asarray(pb[~out]))) - pa[~out], axis=-1
        ).max()
        assert err < 1e-2, err
        # outlier rejection: no gross outlier survives as inlier
        assert not inl[out].any()

    run_node(sizes[0], 0)  # compile both shapes outside the timed section
    run_node(130, 1)
    t0 = time.perf_counter()
    for k, n in enumerate(sizes):
        run_node(n, 10 + k)
    dt = time.perf_counter() - t0
    assert dt < 20.0, f"15 robust Sim3 alignments took {dt:.1f}s"
