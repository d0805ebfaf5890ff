"""SE(3) rigid transforms as a JAX pytree dataclass.

Convention matches the reference's gtsam.Pose3 usage: a camera pose ``wTi``
maps points from frame i (camera) to world: ``p_w = wTi * p_i``.
Relative pose naming ``i2Ti1`` maps frame i1 into frame i2.

All operations broadcast over leading batch dims; `SE3` is registered as a
pytree so it can flow through jit/vmap/pjit.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gtsfm_tpu.geometry import so3
from gtsfm_tpu.utils.numerics import einsum as p_einsum, mm


@struct.dataclass
class SE3:
    """Rigid transform: rotation R (..., 3, 3) and translation t (..., 3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    @classmethod
    def identity(cls, batch_shape: tuple = (), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return cls(R=R, t=t)

    def compose(self, other: "SE3") -> "SE3":
        """self * other (apply other first)."""
        return SE3(R=mm(self.R, other.R), t=so3.rotate(self.R, other.t) + self.t)

    def __mul__(self, other: "SE3") -> "SE3":
        return self.compose(other)

    def inverse(self) -> "SE3":
        Rinv = jnp.swapaxes(self.R, -1, -2)
        return SE3(R=Rinv, t=-so3.rotate(Rinv, self.t))

    def between(self, other: "SE3") -> "SE3":
        """self^-1 * other — e.g. wTi.between(wTj) = iTj."""
        return self.inverse().compose(other)

    def transform(self, p: jnp.ndarray) -> jnp.ndarray:
        """Apply to points (..., 3)."""
        return so3.rotate(self.R, p) + self.t

    def transform_to(self, p: jnp.ndarray) -> jnp.ndarray:
        """Apply inverse to points: world -> local frame."""
        Rinv = jnp.swapaxes(self.R, -1, -2)
        return so3.rotate(Rinv, p - self.t)

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix(es)."""
        batch = self.t.shape[:-1]
        M = jnp.zeros(batch + (4, 4), dtype=self.R.dtype)
        M = M.at[..., :3, :3].set(self.R)
        M = M.at[..., :3, 3].set(self.t)
        M = M.at[..., 3, 3].set(1.0)
        return M

    @classmethod
    def from_matrix(cls, M: jnp.ndarray) -> "SE3":
        return cls(R=M[..., :3, :3], t=M[..., :3, 3])

    @classmethod
    def exp(cls, xi: jnp.ndarray) -> "SE3":
        """Exponential map from twist xi = (omega, v), (..., 6).

        Ordering (rotation first) matches gtsam.Pose3.Expmap.
        """
        w = xi[..., :3]
        v = xi[..., 3:]
        R = so3.expmap(w)
        theta2 = jnp.sum(w * w, axis=-1)
        small = theta2 < 1e-8
        theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
        theta = jnp.sqrt(theta2_safe)
        W = so3.hat(w)
        b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
        c = jnp.where(
            small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta)
        )
        eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
        V = eye + b[..., None, None] * W + c[..., None, None] * mm(W, W)
        return cls(R=R, t=p_einsum("...ij,...j->...i", V, v))

    def log(self) -> jnp.ndarray:
        """Log map to twist (omega, v), (..., 6)."""
        w = so3.logmap(self.R)
        theta2 = jnp.sum(w * w, axis=-1)
        small = theta2 < 1e-8
        theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
        theta = jnp.sqrt(theta2_safe)
        W = so3.hat(w)
        half_theta = 0.5 * theta
        # V^{-1} = I - W/2 + coef * W^2,  coef = (1 - theta*cot(theta/2)/2)/theta^2
        cot_term = half_theta * jnp.cos(half_theta) / jnp.where(
            small, jnp.ones_like(theta), jnp.sin(half_theta)
        )
        coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot_term) / theta2_safe)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
        Vinv = eye - 0.5 * W + coef[..., None, None] * mm(W, W)
        v = p_einsum("...ij,...j->...i", Vinv, self.t)
        return jnp.concatenate([w, v], axis=-1)

    def retract(self, xi: jnp.ndarray) -> "SE3":
        """Right-retraction used by the optimizers: self * Exp(xi)."""
        return self.compose(SE3.exp(xi))

    def local(self, other: "SE3") -> jnp.ndarray:
        """Inverse of retract: Log(self^-1 * other)."""
        return self.between(other).log()

    def __getitem__(self, idx) -> "SE3":
        return SE3(R=self.R[idx], t=self.t[idx])

    @property
    def batch_shape(self) -> tuple:
        return self.t.shape[:-1]
