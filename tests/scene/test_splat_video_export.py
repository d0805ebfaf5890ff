"""Fly-through export: PNG frames + GIF always, mp4 when a codec exists
(reference parity: B-spline camera-path video, splat/rendering.py:102-197)."""

import os

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.geometry import Cal3Bundler, SE3
from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions
from gtsfm_tpu.splat.gs_data import GSData


def _tiny_scene(n_cam=4, G=64, seed=0):
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, np.pi / 4, n_cam)
    centers = np.stack([np.sin(ang), np.zeros(n_cam), -6 + np.cos(ang)], 1)
    poses = SE3(
        R=jnp.tile(jnp.eye(3), (n_cam, 1, 1)),
        t=jnp.asarray(centers, jnp.float32),
    )
    cal = Cal3Bundler.create(
        jnp.full(n_cam, 100.0), jnp.zeros(n_cam), jnp.zeros(n_cam),
        jnp.full(n_cam, 40.0), jnp.full(n_cam, 30.0),
    )
    data = SfmData.empty(n_cam).replace(
        poses=poses, cal=cal, pose_mask=jnp.ones(n_cam, bool)
    )
    means = rng.uniform(-1, 1, (G, 3)).astype(np.float32)
    gs = GSData(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(np.log(rng.uniform(0.05, 0.2, (G, 3))).astype(np.float32)),
        quats=jnp.asarray(np.tile([1, 0, 0, 0.0], (G, 1)).astype(np.float32)),
        colors=jnp.asarray(rng.normal(0, 1, (G, 3)).astype(np.float32)),
        opacity_logit=jnp.asarray(rng.normal(0, 1, G).astype(np.float32)),
        alive=jnp.ones(G, jnp.float32),
    )
    return gs, data


def test_export_splat_video_writes_gif_and_mp4(tmp_path):
    gs, data = _tiny_scene()
    so = SceneOptimizer(SceneOptimizerOptions(save_colmap=False))
    so._export_splat_video(gs, data, str(tmp_path), n_frames=5)

    frames = sorted(os.listdir(tmp_path / "splat_video"))
    assert len(frames) == 5 and frames[0] == "frame_0000.png"
    gif = tmp_path / "splat_flythrough.gif"
    assert gif.is_file() and gif.stat().st_size > 0

    import cv2

    mp4 = tmp_path / "splat_flythrough.mp4"
    probe = cv2.VideoWriter(
        str(tmp_path / "_probe.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (8, 8)
    )
    codec_ok = probe.isOpened()
    probe.release()
    if codec_ok:
        assert mp4.is_file() and mp4.stat().st_size > 0
        cap = cv2.VideoCapture(str(mp4))
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
        cap.release()
