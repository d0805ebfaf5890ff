"""Differentiable 3D Gaussian splat rasterization in JAX.

Parity: /root/reference/gtsfm/splat/rendering.py:14,102-197 (gsplat CUDA
rasterization + B-spline interpolated camera-path rendering).

TPU-native design: EWA projection of 3D gaussians to 2D (mean + 2x2 cov
via the perspective Jacobian), depth sort (indices stop-gradiented), then
front-to-back alpha compositing evaluated in depth-ordered CHUNKS under
lax.scan — the (H, W, chunk) alpha tensor stays in VMEM-scale memory and
the running transmittance carries between chunks, so memory is O(H*W*C)
instead of O(H*W*G). Everything is differentiable for the splat trainer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gtsfm_tpu.geometry import SE3, so3
from gtsfm_tpu.splat.gs_data import GSData
from gtsfm_tpu.utils.numerics import mm


def _quat_to_R(q: jnp.ndarray) -> jnp.ndarray:
    return so3.from_quat(q)


def project_gaussians(gs: GSData, wTc: SE3, K: jnp.ndarray):
    """EWA projection. Returns (xy (G, 2), cov2d (G, 2, 2), depth (G,),
    alpha (G,), rgb (G, 3))."""
    cTw = wTc.inverse()
    p_cam = cTw.transform(gs.means)  # (G, 3)
    z = p_cam[..., 2]
    z_safe = jnp.maximum(z, 1e-6)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = p_cam[..., 0] / z_safe
    y = p_cam[..., 1] / z_safe
    xy = jnp.stack([fx * x + cx, fy * y + cy], axis=-1)

    # 3D covariance: R S S^T R^T
    Rg = _quat_to_R(gs.quats)  # (G, 3, 3)
    S = jnp.exp(gs.log_scales)  # (G, 3)
    M = Rg * S[:, None, :]
    cov3d = mm(M, jnp.swapaxes(M, -1, -2))
    # camera-frame cov
    Wr = cTw.R  # (3, 3)
    cov_cam = mm(mm(jnp.broadcast_to(Wr, cov3d.shape), cov3d), jnp.broadcast_to(Wr.T, cov3d.shape))
    # perspective Jacobian (2, 3) per gaussian
    zero = jnp.zeros_like(z_safe)
    J = jnp.stack(
        [
            jnp.stack([fx / z_safe, zero, -fx * x / z_safe], -1),
            jnp.stack([zero, fy / z_safe, -fy * y / z_safe], -1),
        ],
        axis=-2,
    )  # (G, 2, 3)
    cov2d = mm(mm(J, cov_cam), jnp.swapaxes(J, -1, -2))
    # low-pass (anti-alias) dilation as in EWA/3DGS
    cov2d = cov2d + 0.3 * jnp.eye(2)

    alpha = jax.nn.sigmoid(gs.opacity_logit) * gs.alive
    rgb = jax.nn.sigmoid(gs.colors)
    return xy, cov2d, z, alpha, rgb


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def render(
    gs: GSData,
    wTc: SE3,
    K: jnp.ndarray,
    height: int,
    width: int,
    bg: float = 0.0,
    chunk: int = 256,
):
    """Render an (H, W, 3) image + (H, W) alpha map."""
    xy, cov2d, z, alpha, rgb = project_gaussians(gs, wTc, K)
    G = gs.max_gaussians

    visible = (z > 0.01) & (alpha > 1e-4)
    order = jnp.argsort(jnp.where(visible, z, jnp.inf))
    order = jax.lax.stop_gradient(order)
    xy = xy[order]
    cov = cov2d[order]
    a = jnp.where(visible[order], alpha[order], 0.0)
    col = rgb[order]

    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
    det = jnp.maximum(det, 1e-9)
    inv00 = cov[:, 1, 1] / det
    inv01 = -cov[:, 0, 1] / det
    inv11 = cov[:, 0, 0] / det

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32), jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )

    n_chunks = (G + chunk - 1) // chunk
    pad = n_chunks * chunk - G

    def padz(v):
        return jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)]) if pad else v

    xy_p = padz(xy)
    a_p = padz(a)
    col_p = padz(col)
    i00 = padz(inv00)
    i01 = padz(inv01)
    i11 = padz(inv11)

    def body(carry, c_idx):
        T, color = carry  # T: (H, W) transmittance; color: (H, W, 3)
        s = c_idx * chunk
        cxy = jax.lax.dynamic_slice(xy_p, (s, 0), (chunk, 2))
        ca = jax.lax.dynamic_slice(a_p, (s,), (chunk,))
        cc = jax.lax.dynamic_slice(col_p, (s, 0), (chunk, 3))
        c00 = jax.lax.dynamic_slice(i00, (s,), (chunk,))
        c01 = jax.lax.dynamic_slice(i01, (s,), (chunk,))
        c11 = jax.lax.dynamic_slice(i11, (s,), (chunk,))

        dx = xs[..., None] - cxy[None, None, :, 0]  # (H, W, C)
        dy = ys[..., None] - cxy[None, None, :, 1]
        q = c00 * dx * dx + 2 * c01 * dx * dy + c11 * dy * dy
        g_alpha = jnp.minimum(ca * jnp.exp(-0.5 * q), 0.995)  # (H, W, C)
        g_alpha = jnp.where(q < 16.0, g_alpha, 0.0)  # 4-sigma cutoff

        # front-to-back within the chunk: prefix transmittance
        one_m = 1.0 - g_alpha
        cum = jnp.cumprod(one_m, axis=-1)
        prefix = jnp.concatenate([jnp.ones_like(cum[..., :1]), cum[..., :-1]], axis=-1)
        w = g_alpha * prefix  # per-gaussian weight within chunk
        color = color + T[..., None] * jnp.einsum("hwc,cd->hwd", w, cc)
        T = T * cum[..., -1]
        return (T, color), None

    T0 = jnp.ones((height, width))
    C0 = jnp.zeros((height, width, 3))
    (T, color), _ = jax.lax.scan(body, (T0, C0), jnp.arange(n_chunks))
    color = color + T[..., None] * bg
    return color, 1.0 - T


def bspline_camera_path(wTi: SE3, num_frames: int) -> SE3:
    """Smooth interpolated camera path through the given poses (uniform
    Catmull-Rom on centers + slerp-ish rotation blending).

    Parity: the interpolated-path video rendering of splat/rendering.py:102-197.
    """
    import numpy as np

    n = wTi.t.shape[0]
    ts = np.asarray(wTi.t)
    Rs = np.asarray(wTi.R)
    u = jnp.linspace(0, n - 1.0001, num_frames)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 2)
    f = (u - i0)[:, None]
    # centers: Catmull-Rom
    im1 = jnp.clip(i0 - 1, 0, n - 1)
    i1 = i0 + 1
    i2 = jnp.clip(i0 + 2, 0, n - 1)
    P0, P1, P2, P3 = (jnp.asarray(ts)[i] for i in (im1, i0, i1, i2))
    f2 = f * f
    f3 = f2 * f
    centers = 0.5 * (
        2 * P1 + (-P0 + P2) * f + (2 * P0 - 5 * P1 + 4 * P2 - P3) * f2
        + (-P0 + 3 * P1 - 3 * P2 + P3) * f3
    )
    # rotations: geodesic interpolation between the two bracketing poses
    Ra = jnp.asarray(Rs)[i0]
    Rb = jnp.asarray(Rs)[i1]
    rel = so3.logmap(mm(jnp.swapaxes(Ra, -1, -2), Rb))
    Rint = mm(Ra, so3.expmap(rel * f))
    return SE3(R=Rint, t=centers)
