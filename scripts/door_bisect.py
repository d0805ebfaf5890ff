"""Stage-by-stage TPU-vs-CPU bisect of the Door pipeline (VERDICT r4 #1).

Runs the exact bench config (res 480 / 1200 kp / exhaustive) with every
intermediate dumped to an npz:
  detect      kp_xy, kp_mask
  two_view    i2Ri1, i2Ui1, valid, num_inliers
  view_graph  edge_mask after 2-pass cycle filter
  rotations   wRi, rot_valid (+ AUC of relative rotations vs GT)
  translations wti, ta_inliers
  triangulation points, tri_ok
  ba          final poses, pose AUC@5 vs dataset GT

Usage:
  python scripts/door_bisect.py --backend tpu --out /tmp/door_tpu.npz
  python scripts/door_bisect.py --backend cpu --out /tmp/door_cpu.npz
  python scripts/door_bisect.py --compare /tmp/door_cpu.npz /tmp/door_tpu.npz

Hybrid mode isolates a stage by replaying another run's dump up to
--take-until <stage> then continuing live:
  python scripts/door_bisect.py --backend tpu --take /tmp/door_cpu.npz \
      --take-until two_view --out /tmp/door_hybrid.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

DOOR = "/root/reference/tests/data/set1_lund_door"
STAGES = ["detect", "two_view", "view_graph", "rotations", "translations"]


def _auc5_vs_gt(poses, pose_mask, gt_poses):
    import jax.numpy as jnp

    from gtsfm_tpu.evaluation.metrics import pose_auc
    from gtsfm_tpu.geometry import so3
    from gtsfm_tpu.geometry.sim3 import align_poses_sim3

    mask = np.asarray(pose_mask, bool)
    sim3 = align_poses_sim3(poses, gt_poses, mask=jnp.asarray(mask))
    aligned = sim3.transform_pose(poses)
    # pairwise relative pose errors like evaluation/compare.py: use
    # per-camera absolute after sim3 for a quick scalar here
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, gt_poses.R))[mask]
    auc = pose_auc(r_err)
    return float(auc["pose_auc_@5.0_deg"]), r_err


def run(backend: str, out: str, take: str | None, take_until: str | None,
        seed: int = 0):
    if backend == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from gtsfm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from gtsfm_tpu.loader.base import batch_calibrations
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSiftOptions
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.retriever.retrievers import ExhaustiveRetriever
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions
    from gtsfm_tpu.scene.mvo import MVOOptions

    print(f"[bisect] backend={jax.default_backend()}", file=sys.stderr)
    dump: dict = {"backend": np.array(jax.default_backend())}
    taken = dict(np.load(take)) if take else {}
    until = STAGES.index(take_until) if take_until else -1

    loader = OlssonLoader(DOOR, max_resolution=480)
    n = len(loader)
    cal = batch_calibrations(loader.get_all_intrinsics())
    so = SceneOptimizer(
        SceneOptimizerOptions(
            detector=DoGSiftOptions(max_keypoints=1200, contrast_threshold=0.008),
        ),
        retriever=ExhaustiveRetriever(),
    )
    gt_poses = loader.get_gt_poses()

    t0 = time.perf_counter()
    # ---- detect ----
    if until >= 0:
        kp_xy, kp_mask = taken["kp_xy"], taken["kp_mask"]
        descs = taken["descs"]
    else:
        images, sizes = loader.load_grayscale_batch()
        kp_xy, kp_mask, descs = so._detect_batch(images, sizes)
        kp_xy, kp_mask, descs = map(np.asarray, (kp_xy, kp_mask, descs))
    dump.update(kp_xy=kp_xy, kp_mask=kp_mask, descs=descs)
    print(f"[bisect] detect: {kp_mask.sum(1)} kp/img ({time.perf_counter()-t0:.1f}s)",
          file=sys.stderr)

    # ---- two-view ----
    pairs = ExhaustiveRetriever().get_image_pairs(n)
    if until >= 1:
        tvr = {k[3:]: taken[k] for k in taken if k.startswith("tv_")}
    else:
        tvr = so._run_two_view(pairs, kp_xy, kp_mask, descs, cal)
        tvr = {k: np.asarray(v) for k, v in tvr.items()}
    dump.update({f"tv_{k}": v for k, v in tvr.items()})
    print(f"[bisect] two_view: valid={tvr['valid'].sum()}/{len(pairs)} "
          f"inliers={tvr['num_inliers'][tvr['valid']]}", file=sys.stderr)

    # ---- MVO stages (inlined from scene/mvo.py with dumps) ----
    from gtsfm_tpu.averaging.rotation.averaging import RotationAveraging
    from gtsfm_tpu.averaging.translation.averaging import TranslationAveraging
    from gtsfm_tpu.bundle.ba import BundleAdjustment
    from gtsfm_tpu.bundle.triangulation import triangulate_tracks
    from gtsfm_tpu.geometry import SE3
    from gtsfm_tpu.scene.mvo import MultiViewOptimizer
    from gtsfm_tpu.tracks.dsf import tracks_from_matches
    from gtsfm_tpu.utils.graph import largest_connected_component
    from gtsfm_tpu.utils.numerics import ceil_pow2
    from gtsfm_tpu.view_graph.cycle_consistency import (
        CycleConsistencyFilter,
        EdgeErrorAggregation,
        ViewGraphOptions,
    )

    opts = MVOOptions()
    pairs64 = np.asarray(pairs, np.int64)
    i2Ri1, i2Ui1 = tvr["i2Ri1"], tvr["i2Ui1"]

    if until >= 2:
        edge_mask = taken["edge_mask"].astype(bool)
    else:
        edge_mask = np.asarray(tvr["valid"], bool).copy()
        f1 = CycleConsistencyFilter(ViewGraphOptions(aggregation=EdgeErrorAggregation.MIN))
        edge_mask, _ = f1.run(pairs64, i2Ri1, edge_mask)
        f2 = CycleConsistencyFilter(ViewGraphOptions(aggregation=EdgeErrorAggregation.MEDIAN))
        edge_mask, _ = f2.run(pairs64, i2Ri1, edge_mask)
        cc = largest_connected_component(n, pairs64[edge_mask])
        edge_mask &= cc[pairs64[:, 0]] & cc[pairs64[:, 1]]
    dump["edge_mask"] = edge_mask
    print(f"[bisect] view_graph: {edge_mask.sum()} edges kept", file=sys.stderr)

    # ---- rotation averaging ----
    if until >= 3:
        wRi, rot_valid = taken["wRi"], taken["rot_valid"].astype(bool)
    else:
        ra = RotationAveraging(opts.rotation)
        wRi, rot_valid = ra.run(
            n, pairs64[edge_mask], i2Ri1[edge_mask],
            num_inliers=tvr["num_inliers"][edge_mask],
        )
        wRi = np.asarray(wRi)
    dump.update(wRi=wRi, rot_valid=rot_valid)
    if gt_poses is not None:
        # relative-rotation consistency vs GT (gauge-free)
        from gtsfm_tpu.geometry import so3 as _so3

        idx = np.nonzero(rot_valid)[0]
        errs = []
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                i, j = idx[a], idx[b]
                Rij = wRi[j].T @ wRi[i]
                Gij = np.asarray(gt_poses.R[j]).T @ np.asarray(gt_poses.R[i])
                c = (np.trace(Rij.T @ Gij) - 1) / 2
                errs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        errs = np.array(errs)
        dump["rot_rel_err_deg"] = errs
        print(f"[bisect] rotations: med rel err vs GT = {np.median(errs):.3f} deg "
              f"max={errs.max():.2f}", file=sys.stderr)

    # ---- tracks (host DSF — backend-independent given same inputs) ----
    cmask = tvr["corr_mask"].astype(bool) & edge_mask[:, None]
    track_cam, track_kp, track_uv, track_mask = tracks_from_matches(
        pairs64, tvr["corr_i1"], tvr["corr_i2"], cmask, kp_xy,
        min_track_len=opts.min_track_len, max_track_len=opts.max_track_len,
    )
    T_raw = track_cam.shape[0]
    T_pad = ceil_pow2(T_raw, 16)
    if T_pad != T_raw:
        padn = T_pad - T_raw

        def _padT(a, fill=0):
            return np.concatenate([a, np.full((padn,) + a.shape[1:], fill, a.dtype)])

        track_cam, track_kp = _padT(track_cam), _padT(track_kp)
        track_uv, track_mask = _padT(track_uv), _padT(track_mask)
    print(f"[bisect] tracks: {(track_mask.sum(1) >= 2).sum()} 2d tracks", file=sys.stderr)

    # ---- translation averaging ----
    if until >= 4:
        wti, trans_valid = taken["wti"], taken["trans_valid"].astype(bool)
        ta_inlier_mask = taken["ta_inliers"].astype(bool)
    else:
        from gtsfm_tpu.averaging.translation.averaging import (
            camera_track_directions,
            select_tracks_for_coverage,
        )

        ta = TranslationAveraging(opts.translation)
        track_dirs = None
        if opts.ta_tracks_per_camera > 0:
            sel = select_tracks_for_coverage(track_cam, track_mask, n, opts.ta_tracks_per_camera)
            if len(sel) >= 3:
                cams_d, nodes_d, dirs_d = camera_track_directions(
                    wRi, cal, track_cam, track_uv, track_mask, sel
                )
                S_pad = ceil_pow2(len(sel), 8)
                A_raw = len(cams_d)
                A_pad = ceil_pow2(A_raw + 1, 8)
                padn = A_pad - A_raw
                cams_d = np.concatenate([cams_d, np.zeros(padn, np.int32)])
                nodes_d = np.concatenate([nodes_d, np.full(padn, S_pad - 1, np.int32)])
                dirs_d = np.concatenate([dirs_d, np.tile(np.float32([[0, 0, 1]]), (padn, 1))])
                wts_d = np.concatenate([np.ones(A_raw, np.float32), np.zeros(padn, np.float32)])
                track_dirs = (cams_d, nodes_d, dirs_d, wts_d)
        wti, trans_valid, ta_inlier_mask = ta.run(
            n, pairs64[edge_mask], i2Ui1[edge_mask], wRi,
            seed=opts.seed, track_dirs=track_dirs,
        )
        wti = np.asarray(wti)
    dump.update(wti=wti, trans_valid=trans_valid, ta_inliers=ta_inlier_mask)
    cam_valid = rot_valid & trans_valid
    poses = SE3(R=jnp.asarray(wRi, jnp.float32), t=jnp.asarray(wti, jnp.float32))
    auc_ta, _ = _auc5_vs_gt(poses, cam_valid, gt_poses)
    print(f"[bisect] translations: {cam_valid.sum()} cams, pre-BA abs-rot AUC@5={auc_ta:.4f}",
          file=sys.stderr)

    # ---- triangulation ----
    track_mask2 = track_mask & cam_valid[track_cam]
    key = jax.random.PRNGKey(opts.seed)
    points, tri_inliers, tri_ok = triangulate_tracks(
        poses, cal, jnp.asarray(track_cam), jnp.asarray(track_uv),
        jnp.asarray(track_mask2), key,
        reproj_threshold_px=opts.triangulation_reproj_threshold_px,
        num_hypotheses=opts.triangulation_hypotheses,
        mode=opts.triangulation_mode,
        min_triangulation_angle_deg=opts.min_triangulation_angle_deg,
    )
    points = np.asarray(points)
    tri_inliers = np.asarray(tri_inliers) & track_mask2
    tri_ok = np.asarray(tri_ok) & (tri_inliers.sum(1) >= opts.min_track_len)
    dump.update(points=points, tri_ok=tri_ok)
    print(f"[bisect] triangulation: {tri_ok.sum()} tracks", file=sys.stderr)

    # ---- BA (via the production MVO for exactness of the staged path) ----
    from gtsfm_tpu.common.sfm_data import SfmData

    obs_t, obs_k = np.nonzero(tri_inliers & tri_ok[:, None])
    meas_cam = track_cam[obs_t, obs_k].astype(np.int32)
    meas_uv = track_uv[obs_t, obs_k]
    M_raw = len(obs_t)
    M_pad = ceil_pow2(M_raw, 16)
    padn = M_pad - M_raw
    meas_cam = np.concatenate([meas_cam, np.zeros(padn, np.int32)])
    meas_track = np.concatenate([obs_t.astype(np.int32), np.zeros(padn, np.int32)])
    meas_uv = np.concatenate([meas_uv.astype(np.float32), np.zeros((padn, 2), np.float32)])
    meas_mask = np.concatenate([np.ones(M_raw, bool), np.zeros(padn, bool)])
    data = SfmData(
        poses=poses, cal=cal, pose_mask=jnp.asarray(cam_valid),
        points=jnp.asarray(points, jnp.float32), track_mask=jnp.asarray(tri_ok),
        meas_cam=jnp.asarray(meas_cam), meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(meas_uv, jnp.float32), meas_mask=jnp.asarray(meas_mask),
    )
    ba = BundleAdjustment(opts.ba)
    counts = np.bincount(meas_cam[meas_mask], minlength=n) * cam_valid
    fixed = np.zeros(n, bool)
    fixed[np.argsort(-counts)[:1]] = True
    data, ba_metrics = ba.run_staged(
        data, reproj_thresholds=opts.reproj_thresholds, fixed_cam=jnp.asarray(fixed)
    )
    auc_ba, r_err = _auc5_vs_gt(data.poses, data.pose_mask, gt_poses)
    dump.update(
        final_R=np.asarray(data.poses.R), final_t=np.asarray(data.poses.t),
        final_mask=np.asarray(data.pose_mask), final_auc5=np.array(auc_ba),
        final_rot_errs=r_err,
    )
    print(f"[bisect] BA: abs-rot AUC@5={auc_ba:.4f} rot errs={np.round(r_err, 3)}",
          file=sys.stderr)

    # the bench-identical pairwise pose AUC (compare_reconstructions path)
    from gtsfm_tpu.evaluation.compare import compare_reconstructions

    def fit_gt(data, gt):
        return data.replace(poses=gt)

    ours = compare_reconstructions(data, fit_gt(data, gt_poses))
    scal = {m.name: m.scalar for m in ours.metrics if m.dist is None}
    dump["bench_auc5"] = np.array(scal["pose_auc_@5.0_deg"])
    print(f"[bisect] bench-style pose AUC@5 vs GT = {scal['pose_auc_@5.0_deg']:.4f}",
          file=sys.stderr)
    np.savez(out, **dump)
    print(f"[bisect] wrote {out} ({time.perf_counter()-t0:.1f}s total)", file=sys.stderr)


def compare(a_path: str, b_path: str):
    a, b = dict(np.load(a_path)), dict(np.load(b_path))

    def stat(name, key, fmt=lambda d: f"max|Δ|={np.abs(d).max():.4g}"):
        if key in a and key in b:
            if a[key].shape != b[key].shape:
                print(f"{name:14s} SHAPE MISMATCH {a[key].shape} vs {b[key].shape}")
                return
            d = a[key].astype(np.float64) - b[key].astype(np.float64)
            print(f"{name:14s} {fmt(d)}")

    print(f"A={a_path} ({a['backend']})  B={b_path} ({b['backend']})")
    stat("kp_xy", "kp_xy")
    stat("kp_count", "kp_mask", lambda d: f"count diff={np.abs(d).sum():.0f}")
    stat("tv_valid", "tv_valid", lambda d: f"flips={np.abs(d).sum():.0f}")
    stat("tv_inliers", "tv_num_inliers", lambda d: f"max|Δ|={np.abs(d).max():.0f} meanΔ={d.mean():.2f}")
    stat("tv_i2Ri1", "tv_i2Ri1")
    stat("edge_mask", "edge_mask", lambda d: f"flips={np.abs(d).sum():.0f}")
    stat("wRi", "wRi")
    stat("rot_rel_err", "rot_rel_err_deg",
         lambda d: f"medA={np.median(a['rot_rel_err_deg']):.3f} medB={np.median(b['rot_rel_err_deg']):.3f}")
    stat("wti", "wti")
    stat("ta_inliers", "ta_inliers", lambda d: f"flips={np.abs(d).sum():.0f}")
    stat("tri_ok", "tri_ok", lambda d: f"flips={np.abs(d).sum():.0f}")
    for k in ("final_auc5", "bench_auc5"):
        print(f"{k:14s} A={float(a[k]):.4f}  B={float(b[k]):.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="tpu")
    p.add_argument("--out", default="/tmp/door_dump.npz")
    p.add_argument("--take")
    p.add_argument("--take-until", choices=STAGES)
    p.add_argument("--compare", nargs=2)
    args = p.parse_args()
    if args.compare:
        compare(*args.compare)
    else:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        run(args.backend, args.out, args.take, args.take_until)
