"""Batched DLT triangulation with fixed-iteration RANSAC over view pairs.

Parity: /root/reference/gtsfm/data_association/point3d_initializer.py:117
(Point3dInitializer: GTSAM triangulatePoint3 DLT + RANSAC over 2-view
hypothesis pairs, modes NO_RANSAC/UNIFORM/BIASED_BASELINE/TOPK_BASELINES).

TPU-first re-design: instead of per-track Python loops with data-dependent
hypothesis counts, every track is a fixed-size padded problem and the whole
track set is vmapped; RANSAC uses a static hypothesis count with masked
scoring, and cheirality is a mask rather than an exception.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp

from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.utils.numerics import einsum as p_einsum, nullvec_pinned, precise


class TriangulationMode(enum.Enum):
    NO_RANSAC = 0
    RANSAC_SAMPLE_UNIFORM = 1
    RANSAC_SAMPLE_BIASED_BASELINE = 2
    RANSAC_TOPK_BASELINES = 3


def _dlt_rows(poses_cw_R, poses_cw_t, xy):
    """Build DLT rows for normalized measurements.

    poses_cw_*: (K, 3, 3), (K, 3) world->camera; xy: (K, 2) normalized coords.
    Returns A: (2K, 4).
    """
    P = jnp.concatenate([poses_cw_R, poses_cw_t[..., None]], axis=-1)  # (K, 3, 4)
    u = xy[..., 0:1]
    v = xy[..., 1:2]
    rows_u = u * P[:, 2, :] - P[:, 0, :]
    rows_v = v * P[:, 2, :] - P[:, 1, :]
    return jnp.concatenate([rows_u, rows_v], axis=0)  # (2K, 4)


def _dlt_normal_matrix(wTi: SE3, xy: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cTw = wTi.inverse()
    A = _dlt_rows(cTw.R, cTw.t, xy)  # (2K, 4)
    m2 = jnp.concatenate([mask, mask]).astype(A.dtype)
    A = A * m2[:, None]
    # row normalization improves conditioning
    norms = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.where(norms < 1e-12, 1.0, norms)
    return p_einsum("ki,kj->ij", A, A)


def _dehomogenize(X_h: jnp.ndarray) -> jnp.ndarray:
    w = X_h[3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return X_h[:3] / w_safe


def triangulate_dlt(wTi: SE3, xy: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Exact DLT triangulation of one track (eigh of the 4x4 normal matrix).

    wTi: SE3 with batch (K,) — cameras observing the track.
    xy:  (K, 2) *normalized* (calibrated) image coords.
    mask:(K,) validity.
    Returns world point (3,). With <2 valid views the result is meaningless
    (callers mask on cheirality/validity downstream).
    """
    AtA = _dlt_normal_matrix(wTi, xy, mask)
    _, vecs = jnp.linalg.eigh(AtA)
    return _dehomogenize(vecs[:, 0])


def triangulate_dlt_fast(wTi: SE3, xy: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Hypothesis-grade DLT via pinned-coordinate nullvector (closed-form
    3x3 adjugate solve) — avoids the slow batched eigh on TPU inside the
    per-hypothesis vmap (see utils.numerics.nullvec_pinned rationale).
    Pinning X_h[3] = 1 doubles as dehomogenization."""
    AtA = _dlt_normal_matrix(wTi, xy, mask)
    return _dehomogenize(nullvec_pinned(AtA))


def _reproj_and_depth(wTi: SE3, X: jnp.ndarray):
    """Normalized-plane reprojection of X into each camera; returns
    (xy_hat (K, 2), depth (K,))."""
    p_cam = wTi.transform_to(X)
    z = p_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return p_cam[..., :2] / z_safe[..., None], z


@partial(jax.jit, static_argnames=("num_hypotheses", "mode"))
@precise
def triangulate_track_ransac(
    wTi: SE3,
    xy: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    reproj_threshold: float = 0.005,
    num_hypotheses: int = 64,
    min_triangulation_angle_deg: float = 1.0,
    mode: TriangulationMode = TriangulationMode.RANSAC_SAMPLE_UNIFORM,
):
    """RANSAC-DLT for one track over 2-view hypotheses.

    xy are normalized coords, so reproj_threshold is in normalized units
    (pixel_thresh / focal). Returns (point (3,), inlier_mask (K,), ok bool).

    Hypothesis sampling mirrors the reference's TriangulationOptions modes
    (point3d_initializer.py:46-59): uniform over pairs, baseline-biased, or
    deterministic top-K baselines.
    """
    K = xy.shape[0]
    maskf = mask.astype(xy.dtype)

    # all pair baselines (used by biased modes and angle checks)
    centers = wTi.t
    base = jnp.linalg.norm(centers[:, None, :] - centers[None, :, :], axis=-1)
    iu = jnp.triu_indices(K, k=1)
    pair_i, pair_j = iu[0], iu[1]  # (P,)
    pair_valid = mask[pair_i] & mask[pair_j]
    pair_base = base[pair_i, pair_j] * pair_valid

    n_pairs = pair_i.shape[0]
    if mode == TriangulationMode.NO_RANSAC:
        X = triangulate_dlt(wTi, xy, mask)
        xy_hat, depth = _reproj_and_depth(wTi, X)
        err = jnp.linalg.norm(xy_hat - xy, axis=-1)
        inliers = mask & (depth > 0) & (err < reproj_threshold)
        return X, inliers, jnp.sum(inliers) >= 2

    if mode == TriangulationMode.RANSAC_TOPK_BASELINES:
        k_eff = min(num_hypotheses, n_pairs)
        top = jnp.argsort(-pair_base)[:k_eff]
        hyp_pairs = jnp.stack([pair_i[top], pair_j[top]], axis=-1)
        hyp_pairs = jnp.pad(hyp_pairs, ((0, num_hypotheses - k_eff), (0, 0)))
    else:
        # Gumbel-max categorical sampling: jax.random.choice's cumsum-and-
        # search implementation produces wrong samples when vmapped on TPU
        # (verified against per-track execution); argmax(logits + gumbel)
        # vmaps exactly and is backend-stable.
        if mode == TriangulationMode.RANSAC_SAMPLE_BIASED_BASELINE:
            logits = jnp.where(pair_valid, pair_base, -jnp.inf)
        else:
            logits = jnp.where(pair_valid, 0.0, -jnp.inf)
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(key, (num_hypotheses, n_pairs), minval=1e-12, maxval=1.0)
        ))
        idx = jnp.argmax(logits[None, :] + gumbel, axis=-1)
        hyp_pairs = jnp.stack([pair_i[idx], pair_j[idx]], axis=-1)

    def score_hypothesis(pair):
        i, j = pair[0], pair[1]
        # arithmetic mask instead of a scattered one: bool scatters inside
        # nested vmaps lower incorrectly on TPU
        ar = jnp.arange(K)
        two_mask = ((ar == i) | (ar == j)) & mask
        X = triangulate_dlt_fast(wTi, xy, two_mask)
        xy_hat, depth = _reproj_and_depth(wTi, X)
        err = jnp.linalg.norm(xy_hat - xy, axis=-1)
        inl = mask & (depth > 0) & (err < reproj_threshold)
        # hypothesis views must be distinct, valid, and in front
        ok = (i != j) & (depth[i] > 0) & (depth[j] > 0) & mask[i] & mask[j]
        votes = jnp.where(ok, jnp.sum(inl), -1)
        return votes, inl

    votes, inls = jax.vmap(score_hypothesis)(hyp_pairs)
    best = jnp.argmax(votes)
    best_inl = inls[best]
    # final DLT on all inliers of the best hypothesis
    X = triangulate_dlt(wTi, xy, best_inl)
    xy_hat, depth = _reproj_and_depth(wTi, X)
    err = jnp.linalg.norm(xy_hat - xy, axis=-1)
    inliers = mask & (depth > 0) & (err < reproj_threshold)

    # triangulation angle check: max angle between rays among inlier pairs
    rays = X[None, :] - centers  # (K, 3)
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.clip(p_einsum("id,jd->ij", rays, rays), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cosang))
    pair_inl = inliers[:, None] & inliers[None, :]
    max_angle = jnp.max(jnp.where(pair_inl, ang, 0.0))
    ok = (jnp.sum(inliers) >= 2) & (max_angle >= min_triangulation_angle_deg) & (votes[best] >= 2)
    return X, inliers, ok


def triangulate_tracks(
    wTi_all: SE3,
    cal,
    track_cam_idx: jnp.ndarray,
    track_uv: jnp.ndarray,
    track_mask: jnp.ndarray,
    key: jax.Array,
    reproj_threshold_px: float = 3.0,
    num_hypotheses: int = 64,
    mode: TriangulationMode = TriangulationMode.RANSAC_SAMPLE_UNIFORM,
    min_triangulation_angle_deg: float = 1.0,
):
    """Triangulate a padded batch of tracks.

    wTi_all: SE3 [N] all cameras; cal: batched calibration [N].
    track_cam_idx: i32[T, K] camera index per observation (0 where invalid)
    track_uv:      f32[T, K, 2] pixel observations
    track_mask:    bool[T, K]
    Returns (points f32[T, 3], inlier bool[T, K], ok bool[T]).
    """
    # normalize pixels -> calibrated coords per observation
    cal_m = jax.tree.map(lambda a: a[track_cam_idx], cal)  # [T, K] batched cal
    xy = cal_m.calibrate(track_uv)
    # per-observation focal for threshold conversion
    f = cal_m.fx
    thresh = reproj_threshold_px / jnp.maximum(f, 1e-6)
    mean_thresh = jnp.sum(jnp.where(track_mask, thresh, 0), axis=-1) / jnp.maximum(
        jnp.sum(track_mask, axis=-1), 1
    )

    T = track_cam_idx.shape[0]
    keys = jax.random.split(key, T)

    def one(cam_idx, xy_t, mask_t, thr, k):
        poses_t = jax.tree.map(lambda a: a[cam_idx], wTi_all)
        return triangulate_track_ransac(
            poses_t, xy_t, mask_t, k,
            reproj_threshold=thr,
            num_hypotheses=num_hypotheses,
            min_triangulation_angle_deg=min_triangulation_angle_deg,
            mode=mode,
        )

    return jax.vmap(one)(track_cam_idx, xy, track_mask, mean_thresh, keys)
