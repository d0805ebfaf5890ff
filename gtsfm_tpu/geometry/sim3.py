"""Sim(3) similarity transforms + Umeyama/robust alignment.

Parity targets: gtsam.Similarity3 and the reference's alignment utilities
(/root/reference/gtsfm/utils/align.py, geometry comparisons) used for
GT alignment and hierarchical cluster merging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gtsfm_tpu.geometry import so3
from gtsfm_tpu.utils.numerics import mm
from gtsfm_tpu.geometry.se3 import SE3


@struct.dataclass
class Sim3:
    """Similarity transform: p' = s * R @ p + t."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)
    s: jnp.ndarray  # (...)

    @classmethod
    def identity(cls, batch_shape: tuple = (), dtype=jnp.float32) -> "Sim3":
        return cls(
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            t=jnp.zeros(batch_shape + (3,), dtype=dtype),
            s=jnp.ones(batch_shape, dtype=dtype),
        )

    def transform(self, p: jnp.ndarray) -> jnp.ndarray:
        return self.s[..., None] * so3.rotate(self.R, p) + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            R=mm(self.R, other.R),
            t=self.s[..., None] * so3.rotate(self.R, other.t) + self.t,
            s=self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        Rinv = jnp.swapaxes(self.R, -1, -2)
        sinv = 1.0 / self.s
        return Sim3(R=Rinv, t=-sinv[..., None] * so3.rotate(Rinv, self.t), s=sinv)

    def transform_pose(self, wTi: SE3) -> SE3:
        """Apply to a camera pose: aSb * bTi -> aTi (rotation unscaled).

        Matches gtsam Similarity3.transformFrom on Pose3: the new pose has
        rotation R_sim @ R and center s * R_sim @ c + t.
        """
        return SE3(R=mm(self.R, wTi.R), t=self.transform(wTi.t))


def align_points_umeyama(
    source: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    estimate_scale: bool = True,
) -> Sim3:
    """Weighted Umeyama alignment: find Sim3 minimizing ||target - T(source)||^2.

    source/target: (N, 3); weights: (N,) nonnegative (mask allowed).
    Closed form via SVD of the weighted cross-covariance.
    """
    n = source.shape[0]
    if weights is None:
        weights = jnp.ones(n, dtype=source.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-12)
    w = weights / wsum
    mu_s = jnp.sum(source * w[:, None], axis=0)
    mu_t = jnp.sum(target * w[:, None], axis=0)
    ds = source - mu_s
    dt = target - mu_t
    cov = mm((dt * w[:, None]).T, ds)  # (3, 3) = sum w * dt ds^T
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(mm(U, Vt))
    S = jnp.ones(3, dtype=source.dtype).at[2].set(det)
    R = mm(U * S[None, :], Vt)
    var_s = jnp.sum(w * jnp.sum(ds * ds, axis=-1))
    scale = jnp.where(
        estimate_scale, jnp.sum(D * S) / jnp.maximum(var_s, 1e-12), jnp.ones(())
    )
    t = mu_t - scale * so3.rotate(R, mu_s)
    return Sim3(R=R, t=t, s=scale)


def align_poses_sim3(
    source: SE3, target: SE3, mask: jnp.ndarray | None = None, estimate_scale: bool = True
) -> Sim3:
    """Align two pose sets by their camera centers (Umeyama) and refine the
    rotation with the relative-rotation Karcher mean, mirroring the
    reference's align_poses_sim3 (/root/reference/gtsfm/utils/align.py:94).
    """
    n = source.t.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=bool)
    w = mask.astype(source.t.dtype)
    sim = align_points_umeyama(source.t, target.t, weights=w, estimate_scale=estimate_scale)
    # Rotation-only refinement: mean of target_R @ source_R^T over valid poses.
    rel = mm(target.R, jnp.swapaxes(source.R, -1, -2))  # (N, 3, 3)
    R_refined = so3.karcher_mean(rel, mask=mask)
    # Recompute t with refined R on centers (keep Umeyama scale).
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(source.t * w[:, None], axis=0) / wsum
    mu_t = jnp.sum(target.t * w[:, None], axis=0) / wsum
    t = mu_t - sim.s * so3.rotate(R_refined, mu_s)
    return Sim3(R=R_refined, t=t, s=sim.s)


def align_poses_sim3_robust(
    source: SE3,
    target: SE3,
    mask: jnp.ndarray | None = None,
    iters: int = 5,
    sigma: float = 0.5,
) -> Sim3:
    """IRLS-robust Sim3 alignment on camera centers (Geman-McClure weights).

    Parity: align_poses_sim3_ignore_missing + robust variants in
    /root/reference/gtsfm/utils/align.py:94-257.
    """
    n = source.t.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=bool)
    base_w = mask.astype(source.t.dtype)

    def body(carry, _):
        w = carry
        sim = align_points_umeyama(source.t, target.t, weights=w)
        resid = jnp.linalg.norm(target.t - sim.transform(source.t), axis=-1)
        med = _masked_median(resid, mask)
        scale = jnp.maximum(sigma * jnp.maximum(med, 1e-6), 1e-6)
        w_new = base_w * (scale**2) / (scale**2 + resid**2)
        return w_new, None

    w_final, _ = jax.lax.scan(body, base_w, None, length=iters)
    sim = align_points_umeyama(source.t, target.t, weights=w_final)
    # refine rotation component with weighted Karcher mean of relative rotations
    rel = mm(target.R, jnp.swapaxes(source.R, -1, -2))
    R_refined = so3.karcher_mean(rel, mask=mask)
    wsum = jnp.maximum(jnp.sum(w_final), 1e-12)
    mu_s = jnp.sum(source.t * w_final[:, None], axis=0) / wsum
    mu_t = jnp.sum(target.t * w_final[:, None], axis=0) / wsum
    t = mu_t - sim.s * so3.rotate(R_refined, mu_s)
    return Sim3(R=R_refined, t=t, s=sim.s)


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    big = jnp.where(mask, x, jnp.inf)
    order = jnp.sort(big)
    k = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    return order[(k - 1) // 2]
