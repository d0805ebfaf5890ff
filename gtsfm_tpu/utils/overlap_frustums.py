"""View-frustum overlap computation.

Parity: /root/reference/gtsfm/utils/overlap_frustums.py (257 LoC): estimate
the shared visible volume of two cameras by sampling the first frustum and
checking containment in the second — used to validate retrieved pairs and
to bound merge overlaps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3


def sample_frustum_points(
    wTc: SE3, cal, width: int, height: int,
    z_min: float, z_max: float, samples_per_axis: int = 6,
) -> np.ndarray:
    """World-space grid samples inside one camera's frustum."""
    import itertools

    # sample strictly inside so self-overlap is exactly 1.0
    us = np.linspace(0.5, width - 1.5, samples_per_axis)
    vs = np.linspace(0.5, height - 1.5, samples_per_axis)
    zs = np.geomspace(max(z_min, 1e-3) * 1.02, z_max * 0.98, samples_per_axis)
    uv = np.array(list(itertools.product(us, vs)), np.float32)
    pts = []
    for z in zs:
        X = np.asarray(
            # backproject at depth z
            jax.vmap(lambda p: _backproject(wTc, cal, p, z))(jnp.asarray(uv))
        )
        pts.append(X)
    return np.concatenate(pts)


def _backproject(wTc: SE3, cal, uv, z):
    p_intr = cal.calibrate(uv)
    ray = jnp.concatenate([p_intr, jnp.ones(1)]) * z
    return wTc.transform(ray)


def points_in_view(
    uv: np.ndarray, z: np.ndarray, wh: np.ndarray, z_min: float = 1e-6,
) -> np.ndarray:
    """Batched in-view mask from already-projected points.

    uv: (..., K, 2) pixel coords; z: (..., K) depths; wh: (..., 2) per-view
    (width, height). Pure numpy — the projection itself is the caller's
    (batched, device-side) job."""
    uv = np.asarray(uv)
    z = np.asarray(z)
    wh = np.asarray(wh, np.float32)
    return (
        (z > z_min)
        & (uv[..., 0] >= 0) & (uv[..., 0] < wh[..., None, 0])
        & (uv[..., 1] >= 0) & (uv[..., 1] < wh[..., None, 1])
    )


def in_frustum(
    points: np.ndarray, wTc: SE3, cal, width: int, height: int,
    z_min: float, z_max: float,
) -> np.ndarray:
    """Boolean containment of world points in a camera frustum."""
    p_cam = np.asarray(wTc.transform_to(jnp.asarray(points, jnp.float32)))
    z = p_cam[:, 2]
    uv = np.asarray(cal.uncalibrate(jnp.asarray(p_cam[:, :2] / np.maximum(z[:, None], 1e-9))))
    return (
        (z > z_min) & (z < z_max)
        & (uv[:, 0] >= 0) & (uv[:, 0] < width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < height)
    )


def frustum_overlap_fraction(
    wTc_a: SE3, cal_a, wTc_b: SE3, cal_b,
    width: int, height: int, z_min: float = 0.5, z_max: float = 20.0,
    samples_per_axis: int = 6,
) -> float:
    """Fraction of camera a's frustum samples visible in camera b."""
    pts = sample_frustum_points(wTc_a, cal_a, width, height, z_min, z_max, samples_per_axis)
    inside = in_frustum(pts, wTc_b, cal_b, width, height, z_min, z_max)
    return float(inside.mean())
