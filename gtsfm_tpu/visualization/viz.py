"""Scene visualization: matplotlib 3D plots + track/match overlays.

Parity: /root/reference/gtsfm/visualization/open3d_vis_utils.py (249),
view_scene.py (210), utils/viz.py (335), track_viz_utils.py (234). Open3D
is not in this image, so interactive viewing goes through the standalone
HTML viewer (visualization/viewer.py); static figures use matplotlib.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gtsfm_tpu.common.sfm_data import SfmData


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_scene_3d(data: SfmData, output_path: str, max_points: int = 20000) -> None:
    """3D scatter of tracks + camera frusta axes -> PNG."""
    plt = _plt()
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    tm = np.asarray(data.track_mask)
    pts = np.asarray(data.points)[tm]
    if len(pts) > max_points:
        pts = pts[np.random.default_rng(0).permutation(len(pts))[:max_points]]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5, c="#333333", alpha=0.5)
    pm = np.asarray(data.pose_mask)
    centers = np.asarray(data.poses.t)[pm]
    Rs = np.asarray(data.poses.R)[pm]
    if len(centers):
        scale = 0.1 * (np.ptp(centers, axis=0).max() + 1e-6)
        for c, R in zip(centers, Rs):
            for axis, color in zip(R.T, ["r", "g", "b"]):
                ax.plot(*np.stack([c, c + scale * axis]).T, color=color, linewidth=1)
    ax.set_box_aspect((1, 1, 1))
    fig.tight_layout()
    fig.savefig(output_path, dpi=110)
    plt.close(fig)


def plot_matches(
    img1: np.ndarray, img2: np.ndarray,
    kp1: np.ndarray, kp2: np.ndarray,
    output_path: str, max_draw: int = 150,
) -> None:
    """Side-by-side correspondence overlay. kp1/kp2: (M, 2) matched pairs."""
    plt = _plt()
    h = max(img1.shape[0], img2.shape[0])
    canvas = np.zeros((h, img1.shape[1] + img2.shape[1]), np.float32)
    canvas[: img1.shape[0], : img1.shape[1]] = img1
    canvas[: img2.shape[0], img1.shape[1] :] = img2
    fig, ax = plt.subplots(figsize=(12, 6))
    ax.imshow(canvas, cmap="gray")
    off = img1.shape[1]
    sel = np.arange(len(kp1))
    if len(sel) > max_draw:
        sel = np.random.default_rng(0).permutation(len(sel))[:max_draw]
    for i in sel:
        ax.plot([kp1[i, 0], kp2[i, 0] + off], [kp1[i, 1], kp2[i, 1]], "-", linewidth=0.5)
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(output_path, dpi=100)
    plt.close(fig)


def plot_track_reprojections(
    data: SfmData, images: np.ndarray, track_indices, output_path: str
) -> None:
    """Patches around measurements vs reprojections for chosen tracks
    (parity: track_viz_utils)."""
    plt = _plt()
    err = np.asarray(data.reprojection_errors())
    mcam = np.asarray(data.meas_cam)
    mtrk = np.asarray(data.meas_track)
    muv = np.asarray(data.meas_uv)
    mask = np.asarray(data.meas_mask)
    rows = len(track_indices)
    cols = max((mask & np.isin(mtrk, track_indices)).sum() // max(rows, 1), 1)
    fig, axes = plt.subplots(rows, min(cols, 6), figsize=(2 * min(cols, 6), 2 * rows), squeeze=False)
    for r, t in enumerate(track_indices):
        sel = np.nonzero(mask & (mtrk == t))[0][:6]
        for c, m in enumerate(sel):
            i = mcam[m]
            u, v = muv[m]
            img = images[i]
            y0, x0 = int(max(0, v - 16)), int(max(0, u - 16))
            patch = img[y0 : y0 + 32, x0 : x0 + 32]
            ax = axes[r][c]
            ax.imshow(patch, cmap="gray")
            ax.plot([u - x0], [v - y0], "rx")
            ax.set_title(f"e={err[m]:.2f}px", fontsize=6)
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(output_path, dpi=100)
    plt.close(fig)
