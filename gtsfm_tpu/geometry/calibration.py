"""Camera calibration models (pure JAX pytrees).

Parity: gtsam Cal3Bundler / Cal3_S2 / Cal3DS2 / Cal3Fisheye as enumerated in
/root/reference/gtsfm/common/types.py. Each model maps *intrinsic*
(normalized image-plane) coordinates to pixels via ``uncalibrate`` and back
via ``calibrate`` (fixed-iteration Newton inversion for distortion models,
jit-safe). All ops broadcast over leading batch dims.

For bundle adjustment every model exposes:
  - ``dof``: number of optimizable parameters
  - ``to_params() -> (..., dof)`` / ``with_params(params)``
so the BA layer is calibration-type-agnostic (static python dispatch).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

_NEWTON_ITERS = 10


@struct.dataclass
class Cal3Bundler:
    """Bundler-style: single focal + 2 radial coefficients; fixed principal pt."""

    f: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray

    dof = 3  # f, k1, k2 (u0, v0 fixed — matches gtsam.Cal3Bundler)

    @classmethod
    def create(cls, f, k1=0.0, k2=0.0, u0=0.0, v0=0.0):
        args = jnp.broadcast_arrays(*[jnp.asarray(a, jnp.float32) for a in (f, k1, k2, u0, v0)])
        return cls(*args)

    def uncalibrate(self, p: jnp.ndarray) -> jnp.ndarray:
        """Intrinsic coords (..., 2) -> pixels (..., 2)."""
        r2 = jnp.sum(p * p, axis=-1)
        g = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        fx = (self.f * g)[..., None] * p
        return fx + jnp.stack([self.u0, self.v0], axis=-1)

    def calibrate(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixels -> intrinsic coords via fixed-point iteration."""
        pi = (uv - jnp.stack([self.u0, self.v0], axis=-1)) / self.f[..., None]
        p = pi
        for _ in range(_NEWTON_ITERS):
            r2 = jnp.sum(p * p, axis=-1)
            g = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
            p = pi / g[..., None]
        return p

    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.f)
        o = jnp.ones_like(self.f)
        return jnp.stack(
            [
                jnp.stack([self.f, z, self.u0], -1),
                jnp.stack([z, self.f, self.v0], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    @property
    def fx(self):
        return self.f

    @property
    def fy(self):
        return self.f

    def to_params(self) -> jnp.ndarray:
        return jnp.stack([self.f, self.k1, self.k2], axis=-1)

    def with_params(self, params: jnp.ndarray) -> "Cal3Bundler":
        return self.replace(f=params[..., 0], k1=params[..., 1], k2=params[..., 2])


@struct.dataclass
class Cal3_S2:
    """Pinhole with skew, no distortion."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    s: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray

    dof = 5

    @classmethod
    def create(cls, fx, fy=None, s=0.0, u0=0.0, v0=0.0):
        fy = fx if fy is None else fy
        args = jnp.broadcast_arrays(*[jnp.asarray(a, jnp.float32) for a in (fx, fy, s, u0, v0)])
        return cls(*args)

    def uncalibrate(self, p: jnp.ndarray) -> jnp.ndarray:
        x, y = p[..., 0], p[..., 1]
        u = self.fx * x + self.s * y + self.u0
        v = self.fy * y + self.v0
        return jnp.stack([u, v], axis=-1)

    def calibrate(self, uv: jnp.ndarray) -> jnp.ndarray:
        v = (uv[..., 1] - self.v0) / self.fy
        u = (uv[..., 0] - self.u0 - self.s * v) / self.fx
        return jnp.stack([u, v], axis=-1)

    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, self.s, self.u0], -1),
                jnp.stack([z, self.fy, self.v0], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def to_params(self) -> jnp.ndarray:
        return jnp.stack([self.fx, self.fy, self.s, self.u0, self.v0], axis=-1)

    def with_params(self, params: jnp.ndarray) -> "Cal3_S2":
        return self.replace(
            fx=params[..., 0], fy=params[..., 1], s=params[..., 2],
            u0=params[..., 3], v0=params[..., 4],
        )


@struct.dataclass
class Cal3DS2:
    """Pinhole + radial (k1,k2) + tangential (p1,p2) distortion."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    s: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    dof = 9

    @classmethod
    def create(cls, fx, fy=None, s=0.0, u0=0.0, v0=0.0, k1=0.0, k2=0.0, p1=0.0, p2=0.0):
        fy = fx if fy is None else fy
        args = jnp.broadcast_arrays(
            *[jnp.asarray(a, jnp.float32) for a in (fx, fy, s, u0, v0, k1, k2, p1, p2)]
        )
        return cls(*args)

    def _distort(self, p: jnp.ndarray) -> jnp.ndarray:
        x, y = p[..., 0], p[..., 1]
        r2 = x * x + y * y
        g = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        dx = 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        dy = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([g * x + dx, g * y + dy], axis=-1)

    def uncalibrate(self, p: jnp.ndarray) -> jnp.ndarray:
        d = self._distort(p)
        u = self.fx * d[..., 0] + self.s * d[..., 1] + self.u0
        v = self.fy * d[..., 1] + self.v0
        return jnp.stack([u, v], axis=-1)

    def calibrate(self, uv: jnp.ndarray) -> jnp.ndarray:
        v = (uv[..., 1] - self.v0) / self.fy
        u = (uv[..., 0] - self.u0 - self.s * v) / self.fx
        pd = jnp.stack([u, v], axis=-1)
        p = pd
        for _ in range(_NEWTON_ITERS):
            # fixed point: p = pd - (distort(p) - p)
            p = p + (pd - self._distort(p))
        return p

    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, self.s, self.u0], -1),
                jnp.stack([z, self.fy, self.v0], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def to_params(self) -> jnp.ndarray:
        return jnp.stack(
            [self.fx, self.fy, self.s, self.u0, self.v0, self.k1, self.k2, self.p1, self.p2],
            axis=-1,
        )

    def with_params(self, params: jnp.ndarray) -> "Cal3DS2":
        names = ["fx", "fy", "s", "u0", "v0", "k1", "k2", "p1", "p2"]
        return self.replace(**{n: params[..., i] for i, n in enumerate(names)})


@struct.dataclass
class Cal3Fisheye:
    """Equidistant fisheye model with k1..k4 (matches gtsam.Cal3Fisheye)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    s: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    k3: jnp.ndarray
    k4: jnp.ndarray

    dof = 9

    @classmethod
    def create(cls, fx, fy=None, s=0.0, u0=0.0, v0=0.0, k1=0.0, k2=0.0, k3=0.0, k4=0.0):
        fy = fx if fy is None else fy
        args = jnp.broadcast_arrays(
            *[jnp.asarray(a, jnp.float32) for a in (fx, fy, s, u0, v0, k1, k2, k3, k4)]
        )
        return cls(*args)

    def _theta_d(self, theta: jnp.ndarray) -> jnp.ndarray:
        t2 = theta * theta
        return theta * (1.0 + self.k1 * t2 + self.k2 * t2**2 + self.k3 * t2**3 + self.k4 * t2**4)

    def uncalibrate(self, p: jnp.ndarray) -> jnp.ndarray:
        r = jnp.linalg.norm(p, axis=-1)
        r_safe = jnp.where(r < 1e-9, jnp.ones_like(r), r)
        theta = jnp.arctan(r)
        scale = jnp.where(r < 1e-9, jnp.ones_like(r), self._theta_d(theta) / r_safe)
        d = scale[..., None] * p
        u = self.fx * d[..., 0] + self.s * d[..., 1] + self.u0
        v = self.fy * d[..., 1] + self.v0
        return jnp.stack([u, v], axis=-1)

    def calibrate(self, uv: jnp.ndarray) -> jnp.ndarray:
        yd = (uv[..., 1] - self.v0) / self.fy
        xd = (uv[..., 0] - self.u0 - self.s * yd) / self.fx
        rd = jnp.sqrt(xd * xd + yd * yd)
        rd_safe = jnp.where(rd < 1e-9, jnp.ones_like(rd), rd)
        theta = rd  # init
        for _ in range(_NEWTON_ITERS):
            theta = theta - (self._theta_d(theta) - rd) / jnp.maximum(
                _dtheta_d(self, theta), 1e-9
            )
        r = jnp.tan(theta)
        scale = jnp.where(rd < 1e-9, jnp.ones_like(rd), r / rd_safe)
        return scale[..., None] * jnp.stack([xd, yd], axis=-1)

    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, self.s, self.u0], -1),
                jnp.stack([z, self.fy, self.v0], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def to_params(self) -> jnp.ndarray:
        return jnp.stack(
            [self.fx, self.fy, self.s, self.u0, self.v0, self.k1, self.k2, self.k3, self.k4],
            axis=-1,
        )

    def with_params(self, params: jnp.ndarray) -> "Cal3Fisheye":
        names = ["fx", "fy", "s", "u0", "v0", "k1", "k2", "k3", "k4"]
        return self.replace(**{n: params[..., i] for i, n in enumerate(names)})


def _dtheta_d(cal: Cal3Fisheye, theta: jnp.ndarray) -> jnp.ndarray:
    t2 = theta * theta
    return (
        1.0 + 3.0 * cal.k1 * t2 + 5.0 * cal.k2 * t2**2 + 7.0 * cal.k3 * t2**3 + 9.0 * cal.k4 * t2**4
    )


CALIBRATION_TYPES = (Cal3Bundler, Cal3_S2, Cal3DS2, Cal3Fisheye)
