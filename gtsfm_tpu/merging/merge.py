"""Hierarchical cluster merging: Sim(3) alignment + scene union + parent BA.

Parity: /root/reference/gtsfm/cluster_merging.py — Sim3 alignment from
shared-track correspondences (:73-163), nonlinear Sim3 merge (:164-253),
track dedup + outlier dropping (:616), parent BA, per-node merged metrics
(:506), combine_results (:694).

Design: children produced by the partitioner own disjoint camera sets; the
parent's cut edges provide cross-child keypoint correspondences. Where both
endpoints of a cut correspondence are absorbed into triangulated tracks of
their respective children, the two 3D points form a 3D-3D pair; a robust
(IRLS) Umeyama on those pairs gives the child-to-child Sim3. Scenes are
then concatenated (cameras disjoint, tracks appended, paired tracks
merged), and a parent-level BA polishes the union.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.utils.numerics import precise

from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
from gtsfm_tpu.common.sfm_data import SceneMeta, SfmData
from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.geometry.sim3 import Sim3, align_points_umeyama


class MergeOptions(NamedTuple):
    min_3d3d_pairs: int = 8
    irls_iterations: int = 8
    inlier_threshold_factor: float = 3.0  # x median residual
    run_parent_ba: bool = True
    parent_ba: BAOptions = BAOptions(max_iterations=15, cg_iterations=30, layout="dense")
    parent_reproj_filter_px: float = 5.0


from functools import partial


@partial(jax.jit, static_argnames=("irls_iterations",))
@precise
def _lmeds_irls_sim3(
    pb: jnp.ndarray,  # (P, 3) padded source points
    pa: jnp.ndarray,  # (P, 3) padded target points
    valid: jnp.ndarray,  # (P,) bool
    w_hyp: jnp.ndarray,  # (H, P) minimal-hypothesis weight rows
    factor: jnp.ndarray,  # scalar inlier_threshold_factor
    irls_iterations: int,
):
    """One fused device program: score all LMedS hypotheses (vmapped
    4-point Umeyama fits + masked-median residuals), take the best, then
    run the IRLS Umeyama polish as a lax.scan. Replaces 64 + 8 sequential
    per-hypothesis device round trips with a single call — the per-node
    serialization VERDICT r3 #8 flagged at deep-tree scale."""
    from gtsfm_tpu.geometry.sim3 import _masked_median

    def resid_of(w):
        sim = align_points_umeyama(pb, pa, weights=w)
        return jnp.linalg.norm(sim.transform(pb) - pa, axis=-1)

    resid_h = jax.vmap(resid_of)(w_hyp)  # (H, P)
    med_h = jax.vmap(lambda r: _masked_median(r, valid))(resid_h)  # (H,)
    best = jnp.argmin(med_h)
    med0 = jnp.maximum(med_h[best], 1e-9)
    scale0 = factor * med0
    r0 = resid_h[best]
    w0 = jnp.where(valid, scale0**2 / (scale0**2 + r0**2), 0.0)

    def irls_step(w, _):
        r = resid_of(w)
        med = jnp.maximum(_masked_median(r, valid), 1e-9)
        s = factor * med
        return jnp.where(valid, s**2 / (s**2 + r**2), 0.0), None

    w_f, _ = jax.lax.scan(irls_step, w0, None, length=irls_iterations)
    sim = align_points_umeyama(pb, pa, weights=w_f)
    r_f = resid_of(w_f)
    med_f = jnp.maximum(_masked_median(r_f, valid), 1e-9)
    inliers = valid & (r_f < factor * med_f)
    return sim, inliers


def sim3_from_point_pairs(
    pa: np.ndarray, pb: np.ndarray, opts: MergeOptions = MergeOptions(),
    pad_hwm: Optional[dict] = None,
) -> tuple:
    """Robust Sim3 mapping points b -> frame a via LMedS-initialized IRLS
    Umeyama, fully batched on device (hypotheses vmapped, polish scanned).

    Returns (Sim3, inlier_mask, ok). Parity: cluster_merging.py:73-163
    (Sim3 from shared-track correspondences with robust alignment)."""
    n = len(pa)
    if n < opts.min_3d3d_pairs:
        return Sim3.identity(), np.zeros(n, bool), False

    # pad the pair axis to a pow2 bucket so merge nodes of different sizes
    # share one XLA executable (pad_hwm: buckets only grow within a merge
    # tree, so every node shares ONE trace)
    P = max(8, 1 << (n - 1).bit_length())
    if pad_hwm is not None:
        P = max(P, pad_hwm.get("sim3_pairs", 0))
        pad_hwm["sim3_pairs"] = P
    pa_p = np.zeros((P, 3), np.float32)
    pb_p = np.zeros((P, 3), np.float32)
    pa_p[:n] = pa
    pb_p[:n] = pb
    valid = np.zeros(P, bool)
    valid[:n] = True

    # LMedS initialization: minimal 4-point Umeyama hypotheses scored by
    # median residual — a straight IRLS from the full set collapses when
    # gross outliers dominate the initial unweighted fit
    rng = np.random.default_rng(0)
    H = 64
    n_distinct = min(H, 4 * n)  # tiny sets need fewer distinct hypotheses
    w_hyp = np.zeros((H, P), np.float32)
    for h in range(H):
        w_hyp[h, rng.choice(n, 4, replace=False) if h < n_distinct else [0, 1, 2, 3]] = 1.0

    sim, inliers = _lmeds_irls_sim3(
        jnp.asarray(pb_p), jnp.asarray(pa_p), jnp.asarray(valid),
        jnp.asarray(w_hyp), jnp.float32(opts.inlier_threshold_factor),
        irls_iterations=opts.irls_iterations,
    )
    inliers = np.asarray(inliers)[:n]
    ok = inliers.sum() >= opts.min_3d3d_pairs
    return sim, inliers, bool(ok)


def concatenate_scenes(
    data_a: SfmData,
    data_b: SfmData,
    sim_ab: Sim3,
    merge_track_pairs: Optional[np.ndarray] = None,
    meta: Optional[SceneMeta] = None,
) -> SfmData:
    """Union of two scenes over the SAME global camera index space.

    data_b is transformed into a's frame by sim_ab. Camera slots must be
    disjoint (pose_mask may not overlap). merge_track_pairs (M, 2) gives
    (track_a, track_b) duplicates: b's track is fused into a's (b's
    measurements reassigned, b's point dropped)."""
    assert data_a.max_cameras == data_b.max_cameras
    overlap = np.asarray(data_a.pose_mask) & np.asarray(data_b.pose_mask)
    assert not overlap.any(), "camera sets must be disjoint for concatenation"

    b_moved = data_b.transform(sim_ab)

    # cameras: take a's where masked, else b's
    mask_a = np.asarray(data_a.pose_mask)
    sel = jnp.asarray(mask_a)
    poses = SE3(
        R=jnp.where(sel[:, None, None], data_a.poses.R, b_moved.poses.R),
        t=jnp.where(sel[:, None], data_a.poses.t, b_moved.poses.t),
    )
    cal = jax.tree.map(
        lambda xa, xb: jnp.where(
            sel.reshape((-1,) + (1,) * (xa.ndim - 1)), xa, xb
        ),
        data_a.cal,
        data_b.cal,
    )
    pose_mask = jnp.asarray(mask_a | np.asarray(data_b.pose_mask))

    Ta = data_a.max_tracks
    # remap b's tracks: fused ones point at a's track, others shift by Ta
    b_track_map = np.arange(data_b.max_tracks, dtype=np.int64) + Ta
    drop_b_track = np.zeros(data_b.max_tracks, bool)
    if merge_track_pairs is not None and len(merge_track_pairs):
        for ta, tb in merge_track_pairs:
            b_track_map[tb] = ta
            drop_b_track[tb] = True

    points = jnp.concatenate([data_a.points, b_moved.points])
    track_mask = jnp.concatenate(
        [data_a.track_mask, jnp.asarray(np.asarray(data_b.track_mask) & ~drop_b_track)]
    )
    meas_cam = jnp.concatenate([data_a.meas_cam, data_b.meas_cam])
    meas_track = jnp.concatenate(
        [data_a.meas_track, jnp.asarray(b_track_map[np.asarray(data_b.meas_track)], jnp.int32)]
    )
    meas_uv = jnp.concatenate([data_a.meas_uv, data_b.meas_uv])
    meas_mask = jnp.concatenate([data_a.meas_mask, data_b.meas_mask])

    return SfmData(
        poses=poses, cal=cal, pose_mask=pose_mask,
        points=points, track_mask=track_mask,
        meas_cam=meas_cam, meas_track=meas_track,
        meas_uv=meas_uv, meas_mask=meas_mask,
        meta=meta or data_a.meta,
    )


def compact_tracks(data: SfmData, pad_hwm: Optional[dict] = None) -> tuple:
    """Drop dead track/measurement slots, re-bucketing both axes to pow2
    (grow-only under pad_hwm). A merge concatenates its children's PADDED
    axes, so without this every tree level carries the dead slots of the
    level below AND gets brand-new array shapes — each level then
    recompiles the filter/BA programs (~30-60 s/level on a remote TPU).
    Returns (compacted SfmData, old->new track index map with -1 = dropped)."""
    from gtsfm_tpu.utils.numerics import ceil_pow2

    tm = np.asarray(data.track_mask)
    mm = np.asarray(data.meas_mask)
    mt = np.asarray(data.meas_track)
    live = tm.copy()
    live[mt[mm]] = True
    t_idx = np.flatnonzero(live)
    m_idx = np.flatnonzero(mm)
    if len(t_idx) == 0 or len(m_idx) == 0:
        return data, np.arange(data.max_tracks, dtype=np.int64)

    def _bucket(key, raw, mult):
        v = ceil_pow2(raw, mult)
        if pad_hwm is not None:
            v = max(v, pad_hwm.get(key, 0))
            pad_hwm[key] = v
        return v

    T_loc = _bucket("merge_tracks", len(t_idx), 16)
    M_loc = _bucket("merge_meas", len(m_idx), 16)
    t_pad = np.concatenate([t_idx, np.full(T_loc - len(t_idx), t_idx[0], np.int64)])
    m_pad = np.concatenate([m_idx, np.full(M_loc - len(m_idx), m_idx[0], np.int64)])
    old2new = np.full(data.max_tracks, -1, np.int64)
    old2new[t_idx] = np.arange(len(t_idx))

    points = np.asarray(data.points)
    uv = np.asarray(data.meas_uv)
    mc = np.asarray(data.meas_cam)
    out = data.replace(
        points=jnp.asarray(points[t_pad]),
        track_mask=jnp.asarray(tm[t_pad] & (np.arange(T_loc) < len(t_idx))),
        meas_cam=jnp.asarray(mc[m_pad], jnp.int32),
        meas_track=jnp.asarray(np.maximum(old2new, 0)[mt[m_pad]], jnp.int32),
        meas_uv=jnp.asarray(uv[m_pad]),
        meas_mask=jnp.asarray(mm[m_pad] & (np.arange(M_loc) < len(m_idx))),
    )
    return out, old2new


def merge_children(
    data_a: SfmData,
    data_b: SfmData,
    pairs_3d3d: tuple,  # (pa (K,3), pb (K,3), track_a (K,), track_b (K,))
    opts: MergeOptions = MergeOptions(),
    meta: Optional[SceneMeta] = None,
    pad_hwm: Optional[dict] = None,
) -> tuple:
    """Align child b onto child a via 3D-3D pairs, fuse duplicate tracks,
    optionally run parent BA. Returns (SfmData, metrics dict)."""
    import time as _time

    pa, pb, ta, tb = pairs_3d3d
    metrics = {"num_3d3d_pairs": len(pa)}
    t0 = _time.perf_counter()
    sim, inl, ok = sim3_from_point_pairs(
        np.asarray(pa), np.asarray(pb), opts, pad_hwm=pad_hwm
    )
    metrics["sim3_ok"] = bool(ok)
    metrics["sim3_inliers"] = int(inl.sum())
    metrics["sim3_inlier_mask"] = np.asarray(inl, bool)  # which 3D-3D pairs were fused
    metrics["sim3_sec"] = _time.perf_counter() - t0
    if not ok:
        return None, metrics
    t0 = _time.perf_counter()
    merge_pairs = np.stack([np.asarray(ta)[inl], np.asarray(tb)[inl]], axis=-1)
    merged = concatenate_scenes(data_a, data_b, sim, merge_track_pairs=merge_pairs, meta=meta)
    # compact immediately: downstream filter/BA then run at grow-only
    # bucket shapes shared by every merge node (see compact_tracks)
    merged, track_old2new = compact_tracks(merged, pad_hwm=pad_hwm)
    metrics["track_old2new"] = track_old2new
    merged = merged.filter_by_reprojection_error(opts.parent_reproj_filter_px * 3)
    metrics["concat_sec"] = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    if opts.run_parent_ba:
        ba = BundleAdjustment(opts.parent_ba)
        counts = np.bincount(
            np.asarray(merged.meas_cam)[np.asarray(merged.meas_mask)],
            minlength=merged.max_cameras,
        )
        fixed = np.zeros(merged.max_cameras, bool)
        fixed[np.argmax(counts)] = True
        # compacted solve: the merged pair typically activates a small
        # fraction of the full camera space, and pow2 bucketing shares
        # compiled executables across the merge tree
        merged, ba_metrics = ba.run_compact(
            merged, fixed_cam=jnp.asarray(fixed), pad_hwm=pad_hwm
        )
        merged = merged.filter_by_reprojection_error(opts.parent_reproj_filter_px)
        metrics["parent_ba"] = ba_metrics
    metrics["ba_sec"] = _time.perf_counter() - t0
    metrics["merged_tracks"] = merged.number_tracks()
    metrics["merged_cameras"] = merged.number_images()
    return merged, metrics
