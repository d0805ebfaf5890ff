"""Dense multi-view stereo: plane-sweep depth estimation + fusion.

Parity: /root/reference/gtsfm/densify/mvs_patchmatchnet.py:57 (MVSBase ->
PatchmatchNet inference with source-view selection by triangulation-angle
scoring, geometric-consistency filtering, fused point cloud + metrics) and
mvs_utils.py:98-126 (piecewise-Gaussian view scoring, theta_0 = 5 deg).

TPU-native re-design: PatchmatchNet's learned propagation is replaced by a
classic plane-sweep cost volume — per reference view, D fronto-parallel
(inverse-depth) planes, source images warped by plane-induced homographies
(bilinear gather), zero-mean NCC cost over a window, argmin + parabola
subpixel refinement — all one jit per view. Geometric cross-view
consistency filtering then fuses survivors into a world point cloud.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.utils.numerics import mm


class MVSOptions(NamedTuple):
    num_depths: int = 64
    num_source_views: int = 4
    window: int = 5  # NCC window (odd)
    theta0_deg: float = 5.0  # triangulation-angle score center
    min_consistent_views: int = 2
    max_reproj_err_px: float = 1.0
    max_depth_rel_err: float = 0.01
    depth_margin: float = 1.3  # expand sparse depth range by this factor


def select_source_views(data: SfmData, opts: MVSOptions = MVSOptions()) -> np.ndarray:
    """Score view pairs by shared-track triangulation angles with the
    reference's piecewise-Gaussian (theta0=5deg, mvs_utils.py:98-126);
    return (N, num_source_views) source indices per reference view."""
    n = data.max_cameras
    centers = np.asarray(data.poses.t)
    pts = np.asarray(data.points)
    mcam = np.asarray(data.meas_cam)
    mtrk = np.asarray(data.meas_track)
    mask = np.asarray(data.meas_mask)
    # per-track observing cameras
    score = np.zeros((n, n))
    track_cams: dict = {}
    for c, t in zip(mcam[mask], mtrk[mask]):
        track_cams.setdefault(t, []).append(c)
    theta0 = opts.theta0_deg
    for t, cams in track_cams.items():
        X = pts[t]
        for i in range(len(cams)):
            for j in range(i + 1, len(cams)):
                a, b = cams[i], cams[j]
                va = centers[a] - X
                vb = centers[b] - X
                cosang = np.dot(va, vb) / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-9)
                theta = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
                sigma = 1.0 if theta <= theta0 else 10.0
                s = np.exp(-((theta - theta0) ** 2) / (2 * sigma**2))
                score[a, b] += s
                score[b, a] += s
    src = np.argsort(-score, axis=1)[:, : opts.num_source_views]
    return src.astype(np.int32)


def _depth_range_per_view(data: SfmData, margin: float) -> np.ndarray:
    """(N, 2) [min, max] depth from the sparse tracks seen by each view."""
    n = data.max_cameras
    cam = data.cameras()
    depths = np.full((n, 2), np.nan)
    mcam = np.asarray(data.meas_cam)
    mtrk = np.asarray(data.meas_track)
    mask = np.asarray(data.meas_mask)
    pts = np.asarray(data.points)
    for i in range(n):
        sel = mask & (mcam == i)
        if not sel.any():
            continue
        cam_i = jax.tree.map(lambda a: a[i], cam)
        p_cam = np.asarray(cam_i.pose.transform_to(jnp.asarray(pts[mtrk[sel]])))
        z = p_cam[:, 2]
        z = z[z > 0]
        if len(z) == 0:
            continue
        depths[i] = [np.percentile(z, 2) / margin, np.percentile(z, 98) * margin]
    return depths


@partial(jax.jit, static_argnames=("num_depths", "window"))
def plane_sweep_depth(
    ref_img: jnp.ndarray,  # (H, W) grayscale
    src_imgs: jnp.ndarray,  # (S, H, W)
    ref_K: jnp.ndarray,  # (3, 3)
    src_K: jnp.ndarray,  # (S, 3, 3)
    ref_cTw_R: jnp.ndarray, ref_cTw_t: jnp.ndarray,  # world->ref cam
    src_cTw_R: jnp.ndarray, src_cTw_t: jnp.ndarray,  # (S, 3, 3), (S, 3)
    depth_min: jnp.ndarray, depth_max: jnp.ndarray,
    num_depths: int = 64,
    window: int = 5,
):
    """Plane-sweep stereo for one reference view.

    Returns (depth (H, W), confidence (H, W) in [0,1])."""
    H, W = ref_img.shape
    S = src_imgs.shape[0]
    inv_dmin = 1.0 / jnp.maximum(depth_min, 1e-6)
    inv_dmax = 1.0 / jnp.maximum(depth_max, 1e-6)
    inv_depths = jnp.linspace(inv_dmax, inv_dmin, num_depths)  # far -> near
    depths = 1.0 / inv_depths  # (D,)

    # relative transforms src<-ref: x_s = R_rel x_r + t_rel
    R_rel = mm(src_cTw_R, jnp.broadcast_to(ref_cTw_R.T, (S, 3, 3)))
    t_rel = src_cTw_t - jnp.einsum("sij,j->si", R_rel, ref_cTw_t)

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    pix = jnp.stack([xs, ys, ones], axis=-1)  # (H, W, 3)
    Kinv = jnp.linalg.inv(ref_K)
    rays = jnp.einsum("ij,hwj->hwi", Kinv, pix)  # (H, W, 3) ref-cam rays

    mean_k = jnp.ones((window, window)) / (window * window)

    def box(img):
        return jax.lax.conv_general_dilated(
            img[None, None], mean_k[None, None], (1, 1), "SAME"
        )[0, 0]

    ref_mean = box(ref_img)
    ref_zm = ref_img - ref_mean
    ref_var = box(ref_zm * ref_zm)

    def bilinear(img, x, y):
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        fx = jnp.clip(x - x0, 0, 1)
        fy = jnp.clip(y - y0, 0, 1)
        v = (
            img[y0, x0] * (1 - fy) * (1 - fx)
            + img[y0, x0 + 1] * (1 - fy) * fx
            + img[y0 + 1, x0] * fy * (1 - fx)
            + img[y0 + 1, x0 + 1] * fy * fx
        )
        inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
        return v, inb

    def cost_at_depth(d):
        X_ref = rays * d  # (H, W, 3) points in ref cam at this plane
        def per_src(s):
            Xs = jnp.einsum("ij,hwj->hwi", R_rel[s], X_ref) + t_rel[s]
            z = jnp.maximum(Xs[..., 2], 1e-6)
            uv = jnp.einsum("ij,hwj->hwi", src_K[s], Xs / z[..., None])
            warped, inb = bilinear(src_imgs[s], uv[..., 0], uv[..., 1])
            # zero-mean NCC over window
            wmean = box(warped)
            wzm = warped - wmean
            cov = box(ref_zm * wzm)
            wvar = box(wzm * wzm)
            ncc = cov / jnp.sqrt(jnp.maximum(ref_var * wvar, 1e-10))
            return jnp.where(inb & (Xs[..., 2] > 0), ncc, -1.0)

        nccs = jax.vmap(per_src)(jnp.arange(S))  # (S, H, W)
        # aggregate: mean of top half of sources (robust to occlusion)
        k = max(1, S // 2)
        top = jax.lax.top_k(nccs.transpose(1, 2, 0), k)[0]  # (H, W, k)
        return jnp.mean(top, axis=-1)  # higher = better

    scores = jax.vmap(cost_at_depth)(depths)  # (D, H, W)
    best = jnp.argmax(scores, axis=0)  # (H, W)
    best_score = jnp.max(scores, axis=0)

    # parabola subpixel refinement in inverse-depth space
    d0 = jnp.clip(best - 1, 0, num_depths - 1)
    d2 = jnp.clip(best + 1, 0, num_depths - 1)
    s0 = jnp.take_along_axis(scores, d0[None], axis=0)[0]
    s1 = best_score
    s2 = jnp.take_along_axis(scores, d2[None], axis=0)[0]
    denom = s0 - 2 * s1 + s2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (s0 - s2) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    inv_step = (inv_dmin - inv_dmax) / (num_depths - 1)
    inv_best = inv_dmax + (best.astype(jnp.float32) + delta) * inv_step
    depth = 1.0 / jnp.maximum(inv_best, 1e-6)
    conf = jnp.clip(best_score, 0.0, 1.0)
    return depth, conf


class PlaneSweepMVS:
    """Dense reconstruction over an SfmData scene + images.

    run(data, images) -> (points (P, 3), colors (P,), metrics).
    images: (N, H, W) grayscale aligned with data's camera indexing.
    """

    def __init__(self, options: MVSOptions = MVSOptions()):
        self.options = options

    def run(self, data: SfmData, images: np.ndarray):
        depths, confs = self.compute_depths(data, images)
        return fuse_depth_maps(depths, confs, data, images, self.options)

    def compute_depths(self, data: SfmData, images: np.ndarray):
        """-> ({view: (H, W) depth}, {view: (H, W) confidence})."""
        opts = self.options
        n = data.max_cameras
        pose_mask = np.asarray(data.pose_mask)
        src_sel = select_source_views(data, opts)
        dranges = _depth_range_per_view(data, opts.depth_margin)
        Ks = np.asarray(data.cal.K())
        Rs = np.asarray(data.poses.R)
        ts = np.asarray(data.poses.t)
        cTw_R = Rs.transpose(0, 2, 1)
        cTw_t = -np.einsum("nij,nj->ni", cTw_R, ts)

        depths = {}
        confs = {}
        for i in range(n):
            if not pose_mask[i] or np.isnan(dranges[i, 0]):
                continue
            srcs = [s for s in src_sel[i] if pose_mask[s] and s != i][: opts.num_source_views]
            if len(srcs) < 1:
                continue
            srcs = (srcs + srcs)[: opts.num_source_views]  # pad by repetition
            d, c = plane_sweep_depth(
                jnp.asarray(images[i], jnp.float32),
                jnp.asarray(images[np.asarray(srcs)], jnp.float32),
                jnp.asarray(Ks[i]), jnp.asarray(Ks[np.asarray(srcs)]),
                jnp.asarray(cTw_R[i]), jnp.asarray(cTw_t[i]),
                jnp.asarray(cTw_R[np.asarray(srcs)]), jnp.asarray(cTw_t[np.asarray(srcs)]),
                jnp.asarray(dranges[i, 0]), jnp.asarray(dranges[i, 1]),
                num_depths=opts.num_depths, window=opts.window,
            )
            depths[i] = np.asarray(d)
            confs[i] = np.asarray(c)
        return depths, confs


def fuse_depth_maps(depths, confs, data: SfmData, images: np.ndarray,
                    opts: MVSOptions):
    """Cross-view geometric consistency filtering + fusion into a world
    point cloud (shared by the plane-sweep and PatchmatchNet back-ends)."""
    if True:
        Ks = np.asarray(data.cal.K())
        Rs = np.asarray(data.poses.R)
        ts = np.asarray(data.poses.t)
        cTw_R = Rs.transpose(0, 2, 1)
        cTw_t = -np.einsum("nij,nj->ni", cTw_R, ts)
        pts_out, col_out = [], []
        view_ids = sorted(depths.keys())
        for i in view_ids:
            H, W = depths[i].shape
            ys, xs = np.mgrid[0:H, 0:W]
            step = 2  # subsample for fusion density control
            sel = (confs[i] > 0.3)[::step, ::step]
            xs_s, ys_s = xs[::step, ::step][sel], ys[::step, ::step][sel]
            d_s = depths[i][::step, ::step][sel]
            if len(xs_s) == 0:
                continue
            Kinv = np.linalg.inv(Ks[i])
            rays = (Kinv @ np.stack([xs_s, ys_s, np.ones_like(xs_s)], 0)).T
            X_cam = rays * d_s[:, None]
            X_world = X_cam @ cTw_R[i] + ts[i]  # R^T x via right-multiply

            consistent = np.zeros(len(X_world), np.int32)
            for j in view_ids:
                if j == i:
                    continue
                Xj = X_world @ cTw_R[j].T + cTw_t[j]
                zj = Xj[:, 2]
                ok = zj > 1e-6
                uvj = (Xj / np.maximum(zj[:, None], 1e-6)) @ Ks[j].T
                xj = np.clip(np.round(uvj[:, 0]).astype(int), 0, W - 1)
                yj = np.clip(np.round(uvj[:, 1]).astype(int), 0, H - 1)
                inb = ok & (uvj[:, 0] >= 0) & (uvj[:, 0] < W) & (uvj[:, 1] >= 0) & (uvj[:, 1] < H)
                dj = depths[j][yj, xj]
                rel = np.abs(dj - zj) / np.maximum(zj, 1e-6)
                consistent += (inb & (rel < opts.max_depth_rel_err * 10)).astype(np.int32)
            keep = consistent >= opts.min_consistent_views - 1
            pts_out.append(X_world[keep])
            col_out.append(images[i][ys_s[keep], xs_s[keep]])

        if pts_out:
            points = np.concatenate(pts_out)
            colors = np.concatenate(col_out)
        else:
            points = np.zeros((0, 3), np.float32)
            colors = np.zeros(0, np.float32)
        metrics = {
            "num_views_with_depth": len(view_ids),
            "num_dense_points": len(points),
        }
        return points.astype(np.float32), colors.astype(np.float32), metrics
