"""Plane-sweep MVS test: textured fronto-parallel plane viewed by a small
camera rig; recovered depths must match the plane."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.densify.mvs import MVSOptions, PlaneSweepMVS, plane_sweep_depth, select_source_views
from gtsfm_tpu.geometry import SE3, Cal3_S2


def _texture(u, v):
    """Smooth pseudo-random texture function over plane coords."""
    return (
        0.5
        + 0.2 * np.sin(3.1 * u) * np.cos(2.3 * v)
        + 0.15 * np.sin(7.7 * u + 1.0) * np.sin(5.1 * v + 2.0)
        + 0.1 * np.cos(13.0 * u * v)
    ).astype(np.float32)


def _make_rig(n_cams=4, H=96, W=128, plane_z=5.0, f=100.0):
    """Cameras looking down +z at the textured plane z=plane_z."""
    Ks, Rs, ts, imgs = [], [], [], []
    for i in range(n_cams):
        cx = 0.3 * (i - (n_cams - 1) / 2)
        R = np.eye(3, dtype=np.float32)
        t = np.array([cx, 0.0, 0.0], np.float32)  # wTi: center at (cx, 0, 0)
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        rx = (xs - W / 2) / f
        ry = (ys - H / 2) / f
        # ray from center: X = t + d * (rx, ry, 1); plane z: d = plane_z
        u = t[0] + plane_z * rx
        v = t[1] + plane_z * ry
        imgs.append(_texture(u, v))
        Ks.append(K)
        Rs.append(R)
        ts.append(t)
    return np.stack(Ks), np.stack(Rs), np.stack(ts), np.stack(imgs)


def test_plane_sweep_recovers_plane_depth():
    Ks, Rs, ts, imgs = _make_rig()
    cTw_R = Rs.transpose(0, 2, 1)
    cTw_t = -np.einsum("nij,nj->ni", cTw_R, ts)
    depth, conf = plane_sweep_depth(
        jnp.asarray(imgs[1]), jnp.asarray(imgs[[0, 2, 3]]),
        jnp.asarray(Ks[1]), jnp.asarray(Ks[[0, 2, 3]]),
        jnp.asarray(cTw_R[1]), jnp.asarray(cTw_t[1]),
        jnp.asarray(cTw_R[[0, 2, 3]]), jnp.asarray(cTw_t[[0, 2, 3]]),
        jnp.asarray(3.0), jnp.asarray(8.0), num_depths=48,
    )
    d = np.asarray(depth)
    c = np.asarray(conf)
    inner = np.s_[10:-10, 10:-10]
    good = c[inner] > 0.5
    assert good.mean() > 0.7
    rel_err = np.abs(d[inner][good] - 5.0) / 5.0
    assert np.median(rel_err) < 0.02, np.median(rel_err)


def test_mvs_pipeline_fusion():
    Ks, Rs, ts, imgs = _make_rig(n_cams=4)
    n, H, W = imgs.shape
    f = Ks[0, 0, 0]
    cal = Cal3_S2.create(
        jnp.full(n, f), jnp.full(n, f), jnp.zeros(n), jnp.full(n, W / 2), jnp.full(n, H / 2)
    )
    poses = SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts))
    # sparse tracks: a few plane points observed by all cameras
    rng = np.random.default_rng(0)
    tracks = []
    for _ in range(12):
        u, v = rng.uniform(-1, 1), rng.uniform(-0.5, 0.5)
        X = np.array([u, v, 5.0], np.float32)
        obs = []
        for i in range(n):
            xc = X - ts[i]
            uv = (Ks[i] @ (xc / xc[2]))[:2]
            if 0 <= uv[0] < W and 0 <= uv[1] < H:
                obs.append((i, uv.astype(np.float32)))
        if len(obs) >= 2:
            tracks.append((X, obs))
    data = SfmData.from_cameras_and_tracks(poses, cal, tracks, num_cameras=n)

    mvs = PlaneSweepMVS(MVSOptions(num_depths=48, num_source_views=3))
    pts, cols, metrics = mvs.run(data, imgs)
    assert metrics["num_views_with_depth"] == n
    assert len(pts) > 2000, metrics
    # fused points should lie on the plane z=5
    z_err = np.abs(pts[:, 2] - 5.0)
    assert np.median(z_err) < 0.1, np.median(z_err)


def test_select_source_views():
    Ks, Rs, ts, imgs = _make_rig(n_cams=4)
    n, H, W = imgs.shape
    f = Ks[0, 0, 0]
    cal = Cal3_S2.create(jnp.full(n, f), jnp.full(n, f), jnp.zeros(n), jnp.full(n, W / 2), jnp.full(n, H / 2))
    poses = SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts))
    tracks = [
        (np.array([0.0, 0.0, 5.0], np.float32), [(i, np.array([W / 2, H / 2], np.float32)) for i in range(n)])
    ]
    data = SfmData.from_cameras_and_tracks(poses, cal, tracks, num_cameras=n)
    src = select_source_views(data, MVSOptions(num_source_views=2))
    assert src.shape == (n, 2)
