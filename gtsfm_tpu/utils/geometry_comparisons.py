"""Rotation/translation comparison utilities (named-function parity with
/root/reference/gtsfm/utils/geometry_comparisons.py, 278 LoC)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3, so3
from gtsfm_tpu.geometry.sim3 import align_poses_sim3, align_poses_sim3_robust  # re-export


def compute_relative_rotation_angle(R1: jnp.ndarray, R2: jnp.ndarray) -> float:
    """Geodesic angle between two rotations in degrees."""
    return float(so3.relative_angle_deg(jnp.asarray(R1), jnp.asarray(R2)))


def compute_relative_unit_translation_angle(u1: jnp.ndarray, u2: jnp.ndarray) -> float:
    """Angle between two translation directions (sign-invariant), degrees."""
    u1 = np.asarray(u1, np.float64)
    u2 = np.asarray(u2, np.float64)
    c = abs(np.dot(u1, u2)) / max(np.linalg.norm(u1) * np.linalg.norm(u2), 1e-12)
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def pose_distance(aTb: SE3, aTc: SE3) -> tuple:
    """(rotation deg, translation L2) between two poses in the same frame."""
    rot = float(so3.relative_angle_deg(aTb.R, aTc.R))
    trans = float(jnp.linalg.norm(aTb.t - aTc.t))
    return rot, trans


def compare_rotations(wRi_a, wRi_b, angular_error_threshold_deg: float = 5.0) -> bool:
    """True when the two global-rotation sets agree up to a single global
    rotation within threshold (reference: compare_rotations)."""
    Ra = jnp.asarray(np.asarray(wRi_a))
    Rb = jnp.asarray(np.asarray(wRi_b))
    rel = jnp.einsum("nij,nik->njk", Rb, Ra)  # Rb^T Ra per camera... align:
    # find the best single aligning rotation via the Karcher mean of Rb Ra^T
    G = so3.karcher_mean(jnp.einsum("nij,nkj->nik", Rb, Ra))
    aligned = jnp.einsum("ij,njk->nik", G, Ra)
    errs = np.asarray(so3.relative_angle_deg(aligned, Rb))
    return bool(np.all(errs < angular_error_threshold_deg))


def compare_global_poses(
    wTi_a: SE3, wTi_b: SE3,
    rot_threshold_deg: float = 5.0,
    trans_err_atol: float = 1.0,
    trans_err_rtol: float = 0.1,
) -> bool:
    """Sim3-align a to b and check every pose matches within tolerances —
    the reference's integration-test criterion
    (tests/test_gtsfm_runner_olssonloader.py:44)."""
    n = wTi_a.t.shape[0]
    sim = align_poses_sim3(wTi_a, wTi_b)
    aligned = sim.transform_pose(wTi_a)
    rot_err = np.asarray(so3.relative_angle_deg(aligned.R, wTi_b.R))
    if np.any(rot_err > rot_threshold_deg):
        return False
    ta = np.asarray(aligned.t)
    tb = np.asarray(wTi_b.t)
    return bool(np.allclose(ta, tb, atol=trans_err_atol, rtol=trans_err_rtol))
