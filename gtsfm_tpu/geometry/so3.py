"""SO(3) operations in pure JAX.

Rotations are represented canonically as 3x3 matrices (float32 on TPU).
All functions broadcast over leading batch dimensions and are vmap/jit safe,
including under differentiation (safe-where idiom around small angles).

Capability parity: gtsam.Rot3 as used throughout the reference
(e.g. /root/reference/gtsfm/utils/geometry_comparisons.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsfm_tpu.utils.numerics import mm

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix from axis vector. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat. W: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def expmap(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Uses series expansions near theta=0 with the double-where trick so
    gradients are NaN-free.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    # Safe theta2 to avoid NaN gradients through sqrt at 0.
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * mm(W, W)


def logmap(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Implemented via quaternions: Shepperd extraction is numerically stable
    at every angle, and 2*atan2(|q_v|, q_w) avoids the sin(theta)
    amplification that makes the classic vee(R - R^T) formula blow up
    near theta = pi in float32.
    """
    q = to_quat(R)  # (w, x, y, z), w >= 0 so theta in [0, pi]
    qw = q[..., 0]
    qv = q[..., 1:]
    vn2 = jnp.sum(qv * qv, axis=-1)
    small = vn2 < 1e-14
    # safe sqrt so d||qv||/dqv has no NaN at qv = 0 (logmap is differentiated
    # by the averaging/BA optimizers)
    vn = jnp.sqrt(jnp.where(small, jnp.ones_like(vn2), vn2))
    theta = 2.0 * jnp.arctan2(jnp.where(small, jnp.zeros_like(vn), vn), qw)
    # w = theta * axis = (theta / vn) * qv;  theta/vn -> 2/qw as vn -> 0
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 0.5), theta / vn)
    return scale[..., None] * qv


def project(M: jnp.ndarray) -> jnp.ndarray:
    """Project an arbitrary 3x3 matrix to the nearest rotation (Frobenius).

    Via SVD with determinant correction: R = U diag(1,1,det(UV^T)) V^T.
    """
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(mm(U, Vt))
    D = jnp.ones(M.shape[:-2] + (3,), dtype=M.dtype)
    D = D.at[..., 2].set(det)
    return mm(U * D[..., None, :], Vt)


def from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) (..., 4) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions
    and select the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four squared-magnitude candidates (x4)
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    def safe_div(a, b):
        return a / jnp.where(b < 1e-12, jnp.ones_like(b), b)

    # candidate quaternions; with s = sqrt(q_i^2 * 4), q = [s/2, off/(2s), ...]
    # (normalized below, so only the ratio dominant : off-terms matters)
    sw = jnp.sqrt(jnp.maximum(qw2, 1e-9))
    cand_w = jnp.stack([0.5 * sw, safe_div(m21 - m12, 2 * sw), safe_div(m02 - m20, 2 * sw), safe_div(m10 - m01, 2 * sw)], -1)
    sx = jnp.sqrt(jnp.maximum(qx2, 1e-9))
    cand_x = jnp.stack([safe_div(m21 - m12, 2 * sx), 0.5 * sx, safe_div(m01 + m10, 2 * sx), safe_div(m02 + m20, 2 * sx)], -1)
    sy = jnp.sqrt(jnp.maximum(qy2, 1e-9))
    cand_y = jnp.stack([safe_div(m02 - m20, 2 * sy), safe_div(m01 + m10, 2 * sy), 0.5 * sy, safe_div(m12 + m21, 2 * sy)], -1)
    sz = jnp.sqrt(jnp.maximum(qz2, 1e-9))
    cand_z = jnp.stack([safe_div(m10 - m01, 2 * sz), safe_div(m02 + m20, 2 * sz), safe_div(m12 + m21, 2 * sz), 0.5 * sz], -1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def angle_rad(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in radians of R (..., 3, 3) -> (...)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def relative_angle_rad(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance between two rotations, radians."""
    return angle_rad(mm(jnp.swapaxes(R1, -1, -2), R2))


def relative_angle_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    return jnp.degrees(relative_angle_rad(R1, R2))


def random(key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
    """Uniformly random rotations via normalized quaternions."""
    q = jax.random.normal(key, shape + (4,))
    return from_quat(q)


def rotate(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply rotation(s) to point(s): (..., 3, 3) x (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, p, precision=jax.lax.Precision.HIGHEST)


def karcher_mean(Rs: jnp.ndarray, mask: jnp.ndarray | None = None, iters: int = 10) -> jnp.ndarray:
    """Karcher (geodesic L2) mean of rotations Rs: (N, 3, 3) -> (3, 3).

    Fixed-iteration Gauss-Newton on the tangent space; masked entries ignored.
    Parity: gtsam.FindKarcherMean / KarcherMeanFactor usage in the reference's
    bundle gauge fixing (/root/reference/gtsfm/bundle/bundle_adjustment.py:218-254).
    """
    if mask is None:
        mask = jnp.ones(Rs.shape[0], dtype=bool)
    w = mask.astype(Rs.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)

    def body(mean, _):
        tangents = logmap(mm(jnp.swapaxes(mean, -1, -2)[None], Rs))  # (N, 3)
        delta = jnp.sum(tangents * w[:, None], axis=0) / denom
        return mm(mean, expmap(delta)), None

    init = project(jnp.sum(Rs * w[:, None, None], axis=0) / denom)
    mean, _ = jax.lax.scan(body, init, None, length=iters)
    return mean
