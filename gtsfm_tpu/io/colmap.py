"""COLMAP text-format scene IO (cameras.txt / images.txt / points3D.txt).

Parity: /root/reference/gtsfm/utils/io.py:220-376 (readers) and
GtsfmData.export_as_colmap_text (/root/reference/gtsfm/common/gtsfm_data.py:1214).
Pure Python/numpy — IO is host work.

COLMAP convention: the stored pose is cTw (q, t such that x_cam = R x_world + t);
we store camera poses as wTi, so read = invert, write = invert back.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3, Cal3Bundler, Cal3_S2, Cal3DS2, Cal3Fisheye, so3
from gtsfm_tpu.common.sfm_data import SceneMeta, SfmData


def _rotmat_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Batched (N, 3, 3) -> (N, 4) quaternion (w, x, y, z), w >= 0.

    Host-numpy mirror of so3.to_quat (branch-free Shepperd): export paths
    must not issue eager device ops per camera."""
    R = np.asarray(R, np.float64)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    q2 = np.stack([
        np.maximum(0.0, 1.0 + m00 + m11 + m22),
        np.maximum(0.0, 1.0 + m00 - m11 - m22),
        np.maximum(0.0, 1.0 - m00 + m11 - m22),
        np.maximum(0.0, 1.0 - m00 - m11 + m22),
    ], -1)
    s = 2.0 * np.sqrt(np.maximum(q2, 1e-9))
    sw, sx, sy, sz = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    cands = np.stack([
        np.stack([0.25 * sw, (m21 - m12) / sw,
                  (m02 - m20) / sw, (m10 - m01) / sw], -1),
        np.stack([(m21 - m12) / sx, 0.5 * (0.5 * sx),
                  (m01 + m10) / sx, (m02 + m20) / sx], -1),
        np.stack([(m02 - m20) / sy, (m01 + m10) / sy,
                  0.5 * (0.5 * sy), (m12 + m21) / sy], -1),
        np.stack([(m10 - m01) / sz, (m02 + m20) / sz,
                  (m12 + m21) / sz, 0.5 * (0.5 * sz)], -1),
    ], -2)  # (..., 4 candidates, 4)
    best = np.argmax(q2, axis=-1)
    q = np.take_along_axis(cands, best[..., None, None].repeat(4, -1), -2)[..., 0, :]
    q /= np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    q *= np.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def _quat_to_R(qw, qx, qy, qz) -> np.ndarray:
    return np.asarray(so3.from_quat(jnp.asarray([qw, qx, qy, qz], jnp.float32)))


def _parse_camera_params(model: str, params: list):
    """COLMAP camera model -> (cal_kwargs, cal_type). Returns per-camera dict
    of Cal3* constructor args; scene-level code batches a single type."""
    p = [float(x) for x in params]
    if model == "SIMPLE_PINHOLE":  # f, cx, cy
        return dict(fx=p[0], fy=p[0], u0=p[1], v0=p[2]), Cal3_S2
    if model == "PINHOLE":  # fx, fy, cx, cy
        return dict(fx=p[0], fy=p[1], u0=p[2], v0=p[3]), Cal3_S2
    if model == "SIMPLE_RADIAL":  # f, cx, cy, k
        return dict(f=p[0], u0=p[1], v0=p[2], k1=p[3], k2=0.0), Cal3Bundler
    if model == "RADIAL":  # f, cx, cy, k1, k2
        return dict(f=p[0], u0=p[1], v0=p[2], k1=p[3], k2=p[4]), Cal3Bundler
    if model == "OPENCV":  # fx, fy, cx, cy, k1, k2, p1, p2
        return (
            dict(fx=p[0], fy=p[1], u0=p[2], v0=p[3], k1=p[4], k2=p[5], p1=p[6], p2=p[7]),
            Cal3DS2,
        )
    if model == "OPENCV_FISHEYE":  # fx, fy, cx, cy, k1, k2, k3, k4
        return (
            dict(fx=p[0], fy=p[1], u0=p[2], v0=p[3], k1=p[4], k2=p[5], k3=p[6], k4=p[7]),
            Cal3Fisheye,
        )
    if model == "FULL_OPENCV":  # fx fy cx cy k1 k2 p1 p2 k3 k4 k5 k6 (truncate)
        higher = p[8:12]
        if any(abs(c) > 1e-9 for c in higher):
            warnings.warn(
                f"FULL_OPENCV camera has non-zero k3..k6 {higher}; truncating to "
                "k1,k2,p1,p2 (Cal3DS2) — undistortion will be approximate.",
                stacklevel=3,
            )
        return (
            dict(fx=p[0], fy=p[1], u0=p[2], v0=p[3], k1=p[4], k2=p[5], p1=p[6], p2=p[7]),
            Cal3DS2,
        )
    raise ValueError(f"Unsupported COLMAP camera model: {model}")


def read_cameras_txt(path: str) -> dict:
    """-> {camera_id: (cal_kwargs, cal_type, width, height)}"""
    cams = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            width, height = int(parts[2]), int(parts[3])
            kwargs, cal_type = _parse_camera_params(model, parts[4:])
            cams[cam_id] = (kwargs, cal_type, width, height)
    return cams


def read_images_txt(path: str) -> list:
    """-> list of dicts per image: {image_id, wTi(np R,t), camera_id, name,
    points2d: (K, 3) array of (x, y, point3d_id)} sorted by name."""
    images = []
    # COLMAP pairs each pose line with a POINTS2D line that is EMPTY when an
    # image has no observations (our own write_scene emits such lines), so
    # blank lines must be preserved: skip only comments, then consume lines
    # strictly two at a time (reference reads lines[4::2], utils/io.py:220-376).
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f if not ln.lstrip().startswith("#")]
    # drop trailing blank lines (file-final newline), not interior ones
    while lines and not lines[-1].strip():
        lines.pop()
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        image_id = int(parts[0])
        qw, qx, qy, qz = map(float, parts[1:5])
        tx, ty, tz = map(float, parts[5:8])
        camera_id = int(parts[8])
        name = parts[9]
        R_cw = _quat_to_R(qw, qx, qy, qz)
        t_cw = np.array([tx, ty, tz], np.float32)
        # invert cTw -> wTi
        R_wc = R_cw.T
        t_wc = -R_cw.T @ t_cw
        pts2d = np.zeros((0, 3), np.float32)
        if i + 1 < len(lines):
            vals = lines[i + 1].split()
            if len(vals) >= 3:
                pts2d = np.array(vals, np.float64).reshape(-1, 3).astype(np.float32)
        images.append(
            dict(image_id=image_id, R=R_wc, t=t_wc, camera_id=camera_id, name=name, points2d=pts2d)
        )
    images.sort(key=lambda d: d["name"])
    return images


def read_points3d_txt(path: str) -> list:
    """-> list of (xyz, rgb, error, [(image_id, point2d_idx), ...])"""
    points = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            xyz = np.array(parts[1:4], np.float64).astype(np.float32)
            rgb = np.array(parts[4:7], np.int32)
            err = float(parts[7])
            track = [(int(parts[i]), int(parts[i + 1])) for i in range(8, len(parts), 2)]
            points.append((xyz, rgb, err, track))
    return points


def read_scene(dirpath: str) -> SfmData:
    """Read a COLMAP text scene directory into SfmData.

    Image order = sorted by file name (matches the reference's ColmapLoader,
    /root/reference/gtsfm/loader/colmap_loader.py:19-38).
    """
    cams = read_cameras_txt(os.path.join(dirpath, "cameras.txt"))
    images = read_images_txt(os.path.join(dirpath, "images.txt"))
    points = read_points3d_txt(os.path.join(dirpath, "points3D.txt"))
    return _assemble_scene(cams, images, points)


def _assemble_scene(cams: dict, images: list, points: list) -> SfmData:
    n = len(images)
    id2idx = {im["image_id"]: i for i, im in enumerate(images)}
    Rs = np.stack([im["R"] for im in images]) if n else np.zeros((0, 3, 3), np.float32)
    ts = np.stack([im["t"] for im in images]) if n else np.zeros((0, 3), np.float32)
    poses = SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts))

    # Batch calibrations: require single model type across scene (common case);
    # heterogeneous scenes upgrade everything to the most general shared type.
    cal_types = {cams[im["camera_id"]][1] for im in images}
    if len(cal_types) > 1:
        raise ValueError(f"Mixed COLMAP camera models not yet supported: {cal_types}")
    cal_type = cal_types.pop() if cal_types else Cal3Bundler
    kw_list = [cams[im["camera_id"]][0] for im in images]
    if n:
        keys = kw_list[0].keys()
        batched = {k: jnp.asarray(np.array([kw[k] for kw in kw_list], np.float32)) for k in keys}
        cal = cal_type.create(**batched)
    else:
        cal = Cal3Bundler.create(jnp.ones(1))

    tracks = []
    for xyz, _rgb, _err, obs in points:
        track_obs = []
        for image_id, p2d_idx in obs:
            i = id2idx.get(image_id)
            if i is None:
                continue
            p2d = images[i]["points2d"]
            if p2d_idx >= len(p2d):
                continue
            track_obs.append((i, p2d[p2d_idx, :2]))
        if len(track_obs) >= 2:
            tracks.append((xyz, track_obs))

    meta = SceneMeta(
        image_names=[im["name"] for im in images],
        image_sizes=[
            (cams[im["camera_id"]][2], cams[im["camera_id"]][3]) for im in images
        ],
    )
    return SfmData.from_cameras_and_tracks(poses, cal, tracks, num_cameras=n, meta=meta)


def _camera_line(idx: int, cal, width: int, height: int) -> str:
    from gtsfm_tpu.geometry.calibration import Cal3Bundler as CB, Cal3_S2 as CS2, Cal3DS2 as CDS2, Cal3Fisheye as CF

    def g(attr):
        v = getattr(cal, attr)
        return float(np.asarray(v)[idx] if np.asarray(v).ndim else np.asarray(v))

    if isinstance(cal, CB):
        return f"{idx + 1} RADIAL {width} {height} {g('f')} {g('u0')} {g('v0')} {g('k1')} {g('k2')}"
    if isinstance(cal, CS2):
        return f"{idx + 1} PINHOLE {width} {height} {g('fx')} {g('fy')} {g('u0')} {g('v0')}"
    if isinstance(cal, CDS2):
        return (
            f"{idx + 1} OPENCV {width} {height} {g('fx')} {g('fy')} {g('u0')} {g('v0')} "
            f"{g('k1')} {g('k2')} {g('p1')} {g('p2')}"
        )
    if isinstance(cal, CF):
        return (
            f"{idx + 1} OPENCV_FISHEYE {width} {height} {g('fx')} {g('fy')} {g('u0')} {g('v0')} "
            f"{g('k1')} {g('k2')} {g('k3')} {g('k4')}"
        )
    raise ValueError(f"Unsupported calibration type {type(cal)}")


def write_scene(data: SfmData, dirpath: str) -> None:
    """Write SfmData as COLMAP text (cameras/images/points3D .txt).

    Parity: GtsfmData.export_as_colmap_text (gtsfm_data.py:1214).
    """
    os.makedirs(dirpath, exist_ok=True)
    pose_mask = np.asarray(data.pose_mask)
    track_mask = np.asarray(data.track_mask)
    meas_mask = np.asarray(data.meas_mask)
    meas_cam = np.asarray(data.meas_cam)
    meas_track = np.asarray(data.meas_track)
    meas_uv = np.asarray(data.meas_uv)
    points = np.asarray(data.points)
    Rs = np.asarray(data.poses.R)
    ts = np.asarray(data.poses.t)
    names = (data.meta.image_names if data.meta and data.meta.image_names else None) or [
        f"image_{i:06d}.jpg" for i in range(data.max_cameras)
    ]
    sizes = (data.meta.image_sizes if data.meta and data.meta.image_sizes else None) or [
        (0, 0)
    ] * data.max_cameras

    err = np.asarray(data.reprojection_errors())

    # build per-image 2D point lists + track export indices
    per_image_pts = {i: [] for i in range(data.max_cameras)}
    meas_export_idx = {}
    valid_meas = np.nonzero(meas_mask & track_mask[meas_track] & pose_mask[meas_cam])[0]
    for mi in valid_meas:
        i = int(meas_cam[mi])
        j = int(meas_track[mi])
        per_image_pts[i].append((meas_uv[mi, 0], meas_uv[mi, 1], j + 1))
        meas_export_idx[mi] = len(per_image_pts[i]) - 1

    with open(os.path.join(dirpath, "cameras.txt"), "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for i in range(data.max_cameras):
            if not pose_mask[i]:
                continue
            w, h = sizes[i]
            f.write(_camera_line(i, data.cal, w, h) + "\n")

    # batch the world->cam quaternion conversion in HOST numpy: a per-camera
    # eager so3.to_quat costs ~1.5s of remote-TPU op dispatches (round-4
    # palace profile: 115 calls = 153s of wall for a pure export step)
    R_cw_all = np.transpose(Rs, (0, 2, 1))
    t_cw_all = -np.einsum("nij,nj->ni", R_cw_all, ts)
    q_all = _rotmat_to_quat_np(R_cw_all)

    with open(os.path.join(dirpath, "images.txt"), "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        for i in range(data.max_cameras):
            if not pose_mask[i]:
                continue
            t_cw = t_cw_all[i]
            q = q_all[i]
            f.write(
                f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} {t_cw[0]} {t_cw[1]} {t_cw[2]} {i + 1} {names[i]}\n"
            )
            f.write(" ".join(f"{x} {y} {pid}" for x, y, pid in per_image_pts[i]) + "\n")

    with open(os.path.join(dirpath, "points3D.txt"), "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        f.write("#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as (IMAGE_ID, POINT2D_IDX)\n")
        # group measurement export indices per track
        track_obs = {j: [] for j in np.nonzero(track_mask)[0]}
        for mi in valid_meas:
            track_obs[int(meas_track[mi])].append((int(meas_cam[mi]) + 1, meas_export_idx[mi]))
        for j, obs in track_obs.items():
            track_err = err[(meas_track == j) & meas_mask]
            track_err = track_err[np.isfinite(track_err)]
            e = float(np.mean(track_err)) if track_err.size else 0.0
            obs_str = " ".join(f"{iid} {pidx}" for iid, pidx in obs)
            x, y, z = points[j]
            f.write(f"{j + 1} {x} {y} {z} 128 128 128 {e} {obs_str}\n")


# ---- COLMAP binary format -------------------------------------------------
# Parity: AstroVision and standard COLMAP outputs ship cameras.bin /
# images.bin / points3D.bin; format per COLMAP's read_write_model.

import struct as _struct

_BIN_CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 3 + 1),
    3: ("RADIAL", 5), 4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5), 8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}


def read_cameras_bin(path: str) -> dict:
    """Binary cameras.bin -> same mapping as read_cameras_txt."""
    cams = {}
    with open(path, "rb") as f:
        n = _struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            cam_id, model_id, width, height = _struct.unpack("<iiQQ", f.read(24))
            name, n_params = _BIN_CAMERA_MODELS[model_id]
            params = _struct.unpack(f"<{n_params}d", f.read(8 * n_params))
            kwargs, cal_type = _parse_camera_params(name, params)
            cams[cam_id] = (kwargs, cal_type, int(width), int(height))
    return cams


def read_images_bin(path: str) -> list:
    """Binary images.bin -> same records as read_images_txt."""
    images = []
    with open(path, "rb") as f:
        n = _struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            image_id = _struct.unpack("<i", f.read(4))[0]
            qw, qx, qy, qz, tx, ty, tz = _struct.unpack("<7d", f.read(56))
            camera_id = _struct.unpack("<i", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            n2d = _struct.unpack("<Q", f.read(8))[0]
            raw = np.frombuffer(f.read(24 * n2d), dtype="<f8").reshape(-1, 3)
            pts2d = raw.astype(np.float32)  # (x, y, point3d_id-as-double)
            R_cw = _quat_to_R(qw, qx, qy, qz)
            t_cw = np.array([tx, ty, tz], np.float32)
            images.append(
                dict(
                    image_id=image_id, R=R_cw.T, t=-R_cw.T @ t_cw,
                    camera_id=camera_id, name=name.decode(), points2d=pts2d,
                )
            )
    images.sort(key=lambda d: d["name"])
    return images


def read_points3d_bin(path: str) -> list:
    points = []
    with open(path, "rb") as f:
        n = _struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            pid = _struct.unpack("<Q", f.read(8))[0]
            xyz = np.frombuffer(f.read(24), dtype="<f8").astype(np.float32)
            rgb = np.frombuffer(f.read(3), dtype=np.uint8).astype(np.int32)
            err = _struct.unpack("<d", f.read(8))[0]
            track_len = _struct.unpack("<Q", f.read(8))[0]
            raw = np.frombuffer(f.read(8 * track_len), dtype="<i4").reshape(-1, 2)
            track = [(int(a), int(b)) for a, b in raw]
            points.append((xyz, rgb, float(err), track))
    return points


def read_scene_binary(dirpath: str) -> SfmData:
    """Binary-format twin of read_scene."""
    cams = read_cameras_bin(os.path.join(dirpath, "cameras.bin"))
    images = read_images_bin(os.path.join(dirpath, "images.bin"))
    points = read_points3d_bin(os.path.join(dirpath, "points3D.bin"))
    return _assemble_scene(cams, images, points)
