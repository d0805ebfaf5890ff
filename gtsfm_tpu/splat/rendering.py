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
from jax.experimental import pallas as pl

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


def render_tiled(
    gs: GSData,
    wTc: SE3,
    K: jnp.ndarray,
    height: int,
    width: int,
    bg: float = 0.0,
    tile: int = 16,
    per_tile_cap: int = 512,
    max_dup: int = 16,
):
    """Tile-binned rasterization (public wrapper).

    The sort key packs (tile_id, depth_rank) into int32 (x64 is disabled
    under jit), so the bit split is chosen per problem: rank gets
    ceil(log2(G)) bits and the tile grid the rest. Large frames with many
    gaussians get coarser tiles (same total pixel work) instead of a
    trace-time crash; if even 128px tiles don't fit, fall back to the
    dense render().
    """
    G = gs.max_gaussians
    rank_bits = max(1, (max(G, 2) - 1).bit_length())
    while True:
        ny = -(-height // tile)
        nx = -(-width // tile)
        # strictly below the reserved invalid-tile decode value
        if ny * nx < (1 << (31 - rank_bits)) - 1 or tile >= 128:
            break
        tile *= 2
    if ny * nx >= (1 << (31 - rank_bits)) - 1:
        return render(gs, wTc, K, height, width, bg=bg)
    return _render_tiled_impl(
        gs, wTc, K, height, width, bg=bg, tile=tile,
        per_tile_cap=per_tile_cap, max_dup=max_dup, rank_bits=rank_bits,
    )


@partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "per_tile_cap", "max_dup", "rank_bits"),
)
def _render_tiled_impl(
    gs: GSData,
    wTc: SE3,
    K: jnp.ndarray,
    height: int,
    width: int,
    bg: float = 0.0,
    tile: int = 16,
    per_tile_cap: int = 512,
    max_dup: int = 16,
    rank_bits: int = 20,
):
    """Tile-binned rasterization — the gsplat algorithm, XLA-native.

    Parity: /root/reference/gtsfm/splat/rendering.py:14 (gsplat CUDA
    tile rasterizer). render() evaluates every gaussian at every pixel
    (O(H*W*G)); this builds per-tile gaussian lists so each 16x16 tile
    composites only the gaussians whose 3-sigma bbox overlaps it —
    ~100-1000x less math at 100k-1M gaussians. TPU mapping:

      * binning = ONE device-wide sort of (tile_id, depth-rank) packed
        int32 keys over G*max_dup duplicated entries (no atomics/scatter:
        the CUDA kernel's per-tile atomic lists become a sort + two
        searchsorted boundary lookups);
      * each tile takes its first per_tile_cap gaussians front-to-back
        (the CUDA kernel's early saturation termination becomes a static
        cap — farther gaussians behind an almost-opaque prefix);
      * compositing is a lax.scan over capacity chunks of a dense
        (n_tiles, chunk, tile*tile) tensor — tiles ride the batch axis,
        the 256 tile pixels ride the lanes.

    Constraints (asserted): rank fits rank_bits and the tile grid fits
    the remaining 31 - rank_bits key bits (the wrapper guarantees both).
    """
    th = tw = tile
    ny = (height + th - 1) // th
    nx = (width + tw - 1) // tw
    n_tiles = ny * nx
    G = gs.max_gaussians
    assert G <= (1 << rank_bits), "render_tiled: G must fit the rank bits"
    # the top tile decode value is reserved: invalid duplicate slots carry
    # key int32-max, whose high bits sort after every real tile
    assert n_tiles < (1 << (31 - rank_bits)) - 1, "render_tiled: tile grid must fit key bits"

    xy, cov2d, z, alpha, rgb = project_gaussians(gs, wTc, K)
    visible = (z > 0.01) & (alpha > 1e-4)

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    det = jnp.maximum(det, 1e-9)
    inv00 = cov2d[:, 1, 1] / det
    inv01 = -cov2d[:, 0, 1] / det
    inv11 = cov2d[:, 0, 0] / det
    # 4-sigma radius from the major eigenvalue (matches the q < 16
    # evaluation cutoff so binning never drops an evaluated pixel)
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))

    # tile bbox per gaussian (clamped); duplicate over <= max_dup slots
    side = int(max_dup**0.5)
    assert side * side == max_dup, "max_dup must be a square"
    tx0 = jnp.clip(jnp.floor((xy[:, 0] - radius) / tw), 0, nx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((xy[:, 0] + radius) / tw), 0, nx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((xy[:, 1] - radius) / th), 0, ny - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((xy[:, 1] + radius) / th), 0, ny - 1).astype(jnp.int32)
    # gaussians overflowing the dup budget keep the window CENTERED on
    # their center tile (where alpha is largest); only the far halo of an
    # oversized footprint is dropped
    tcx = jnp.clip(jnp.floor(xy[:, 0] / tw), 0, nx - 1).astype(jnp.int32)
    tcy = jnp.clip(jnp.floor(xy[:, 1] / th), 0, ny - 1).astype(jnp.int32)
    wx0 = jnp.clip(tcx - (side - 1) // 2, tx0, jnp.maximum(tx1 - side + 1, tx0))
    wy0 = jnp.clip(tcy - (side - 1) // 2, ty0, jnp.maximum(ty1 - side + 1, ty0))
    dxs = jnp.arange(side, dtype=jnp.int32)
    gx = wx0[:, None] + dxs[None, :]  # (G, side)
    gy = wy0[:, None] + dxs[None, :]
    in_x = gx <= tx1[:, None]
    in_y = gy <= ty1[:, None]
    tile_x = jnp.broadcast_to(gx[:, None, :], (G, side, side))
    tile_y = jnp.broadcast_to(gy[:, :, None], (G, side, side))
    dup_ok = jnp.broadcast_to(in_x[:, None, :], (G, side, side)) & jnp.broadcast_to(
        in_y[:, :, None], (G, side, side)
    )
    tile_id = (tile_y * nx + tile_x).reshape(G, max_dup)
    dup_ok = (dup_ok.reshape(G, max_dup) & visible[:, None])

    # depth rank (front first) shared by all duplicates of a gaussian
    order = jnp.argsort(jnp.where(visible, z, jnp.inf))
    rank = jnp.zeros(G, jnp.int32).at[order].set(jnp.arange(G, dtype=jnp.int32))
    key = jnp.where(
        dup_ok, tile_id * (1 << rank_bits) + rank[:, None], jnp.iinfo(jnp.int32).max
    ).reshape(-1)
    # one multi-operand sort carries the gaussian index alongside the key
    # (an argsort would pay a second (key, iota) pass + an extra gather)
    gauss_of_dup = (
        jnp.arange(G * max_dup, dtype=jnp.int32) // max_dup
    )
    sorted_key, sorted_gauss = jax.lax.sort((key, gauss_of_dup), num_keys=1)
    sorted_tile = sorted_key >> rank_bits  # invalid entries decode past n_tiles

    # per-tile segment [st, en) in the sorted order
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    st = jnp.searchsorted(sorted_tile, tids, side="left")
    en = jnp.searchsorted(sorted_tile, tids, side="right")
    slot = st[:, None] + jnp.arange(per_tile_cap, dtype=jnp.int32)[None, :]
    slot_ok = slot < en[:, None]
    slot = jnp.minimum(slot, G * max_dup - 1)
    gidx = sorted_gauss[slot]  # (n_tiles, cap)

    # gather per-tile gaussian attributes as ONE packed row gather (9
    # contiguous f32 per row) instead of nine scalar gathers — gathers,
    # not the sort, dominate the binning stage on TPU
    packed = jnp.stack(
        [xy[:, 0], xy[:, 1], alpha, rgb[:, 0], rgb[:, 1], rgb[:, 2],
         inv00, inv01, inv11], axis=-1
    )  # (G, 9)
    t_attr = packed[gidx]  # (n_tiles, cap, 9)
    t_xy = t_attr[..., 0:2]
    t_a = jnp.where(slot_ok, t_attr[..., 2], 0.0)
    t_rgb = t_attr[..., 3:6]
    t_i00 = t_attr[..., 6]
    t_i01 = t_attr[..., 7]
    t_i11 = t_attr[..., 8]

    P = th * tw
    origins = jnp.stack(
        [(tids % nx) * tw, (tids // nx) * th], axis=-1
    ).astype(jnp.int32)
    if jax.default_backend() == "tpu":
        # Pallas per-tile kernel forward (compositing entirely in VMEM
        # with gsplat's early saturation termination); gradients flow
        # through the XLA formulation via the custom VJP
        color, T = _composite_pallas_vjp(
            t_xy, t_a, t_rgb, t_i00, t_i01, t_i11, origins, th
        )
    else:
        color, T = _composite_tiles_xla(
            t_xy, t_a, t_rgb, t_i00, t_i01, t_i11, origins, th
        )
    color = color + T[..., None] * bg

    img = color.reshape(ny, nx, th, tw, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(ny * th, nx * tw, 3)[:height, :width]
    am = (1.0 - T).reshape(ny, nx, th, tw).transpose(0, 2, 1, 3)
    am = am.reshape(ny * th, nx * tw)[:height, :width]
    return img, am


# ---------------------------------------------------------------------------
# Pallas tile compositing (the gsplat CUDA rasterize kernel, TPU-native)
# ---------------------------------------------------------------------------


_NT = 128  # tiles per grid program (one full lane row)


def _composite_kernel(ax_ref, ay_ref, aa_ref, ar_ref, ag_ref, ab_ref,
                      i00_ref, i01_ref, i11_ref, org_ref,
                      cr_ref, cg_ref, cb_ref, t_ref, *, cap: int, tile: int):
    """One grid program composites _NT tiles in parallel across the lane
    axis: sequential front-to-back over the (depth-sorted) gaussian slot
    axis, vectorized over (pixels x tiles) = (tile^2, _NT) registers, with
    gsplat's early saturation termination. Attribute layout: (cap, _NT) —
    slot g of every tile is one lane vector, so the inner loop is pure
    (P, _NT) VPU math with no HBM traffic."""
    P = tile * tile
    CH = 8  # gaussian slots per chunk (one sublane tile of attributes)
    n_chunks = cap // CH
    ox = org_ref[0, :].astype(jnp.float32)  # (_NT,)
    oy = org_ref[1, :].astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, _NT), 0)
    pix_x = ox[None, :] + (pix % tile).astype(jnp.float32)
    pix_y = oy[None, :] + (pix // tile).astype(jnp.float32)

    def cond(carry):
        c, T, _cr, _cg, _cb = carry
        # a tile is live while it still has packed slots (alpha > 0 at the
        # chunk head) AND is not saturated; empty/padded tiles (alpha 0
        # everywhere) never stall the loop
        s = jnp.minimum(c * CH, cap - 1)
        has_work = aa_ref[s, :] > 0.0  # (_NT,)
        t_alive = jnp.max(T, axis=0) > 1.0 / 255.0
        return (c < n_chunks) & jnp.any(has_work & t_alive)

    def body(carry):
        c, T, cr, cg, cb = carry
        s = c * CH
        a_c = aa_ref[pl.ds(s, CH), :]  # (CH, _NT) single sublane-tile loads
        x_c = ax_ref[pl.ds(s, CH), :]
        y_c = ay_ref[pl.ds(s, CH), :]
        r_c = ar_ref[pl.ds(s, CH), :]
        g_c = ag_ref[pl.ds(s, CH), :]
        b_c = ab_ref[pl.ds(s, CH), :]
        i00_c = i00_ref[pl.ds(s, CH), :]
        i01_c = i01_ref[pl.ds(s, CH), :]
        i11_c = i11_ref[pl.ds(s, CH), :]
        for j in range(CH):  # front-to-back within the chunk (unrolled)
            dx = pix_x - x_c[j][None, :]  # (P, _NT)
            dy = pix_y - y_c[j][None, :]
            q = (
                i00_c[j][None, :] * dx * dx
                + 2.0 * i01_c[j][None, :] * dx * dy
                + i11_c[j][None, :] * dy * dy
            )
            g_alpha = jnp.minimum(a_c[j][None, :] * jnp.exp(-0.5 * q), 0.995)
            g_alpha = jnp.where(q < 16.0, g_alpha, 0.0)
            w = g_alpha * T
            cr = cr + w * r_c[j][None, :]
            cg = cg + w * g_c[j][None, :]
            cb = cb + w * b_c[j][None, :]
            T = T * (1.0 - g_alpha)
        return c + 1, T, cr, cg, cb

    z = jnp.zeros((P, _NT), jnp.float32)
    init = (jnp.int32(0), jnp.ones((P, _NT), jnp.float32), z, z, z)
    _, T, cr, cg, cb = jax.lax.while_loop(cond, body, init)
    cr_ref[:, :] = cr
    cg_ref[:, :] = cg
    cb_ref[:, :] = cb
    t_ref[:, :] = T


def _composite_tiles_xla(t_xy, t_a, t_rgb, t_i00, t_i01, t_i11,
                         origins, tile: int):
    """XLA chunked-scan compositing (CPU path + the differentiable
    formulation backing the Pallas kernel's custom VJP)."""
    n_tiles, cap = t_a.shape
    th = tw = tile
    P = th * tw
    py, px = jnp.meshgrid(
        jnp.arange(th, dtype=jnp.float32), jnp.arange(tw, dtype=jnp.float32),
        indexing="ij",
    )
    ox = origins[:, 0].astype(jnp.float32)
    oy = origins[:, 1].astype(jnp.float32)
    pix_x = ox[:, None] + px.reshape(-1)[None, :]  # (n_tiles, P)
    pix_y = oy[:, None] + py.reshape(-1)[None, :]

    chunk = min(64, cap)
    n_chunks = cap // chunk

    def body(carry, c_idx):
        T, color = carry  # T (n_tiles, P); color (n_tiles, P, 3)
        s = c_idx * chunk
        sl = lambda v: jax.lax.dynamic_slice_in_dim(v, s, chunk, axis=1)
        dx = pix_x[:, None, :] - sl(t_xy[..., 0])[..., None]  # (n_tiles, chunk, P)
        dy = pix_y[:, None, :] - sl(t_xy[..., 1])[..., None]
        q = (
            sl(t_i00)[..., None] * dx * dx
            + 2.0 * sl(t_i01)[..., None] * dx * dy
            + sl(t_i11)[..., None] * dy * dy
        )
        g_alpha = jnp.minimum(sl(t_a)[..., None] * jnp.exp(-0.5 * q), 0.995)
        g_alpha = jnp.where(q < 16.0, g_alpha, 0.0)
        one_m = 1.0 - g_alpha
        cum = jnp.cumprod(one_m, axis=1)  # over the chunk (front-to-back)
        prefix = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        w = g_alpha * prefix  # (n_tiles, chunk, P)
        color = color + T[:, :, None] * jnp.einsum("tcp,tcd->tpd", w, sl(t_rgb))
        T = T * cum[:, -1]
        return (T, color), None

    T0 = jnp.ones((n_tiles, P))
    C0 = jnp.zeros((n_tiles, P, 3))
    (T, color), _ = jax.lax.scan(body, (T0, C0), jnp.arange(n_chunks))
    return color, T


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def _composite_pallas_vjp(t_xy, t_a, t_rgb, t_i00, t_i01, t_i11, origins,
                          tile: int):
    return _composite_tiles_pallas(
        t_xy, t_a, t_rgb, t_i00, t_i01, t_i11, origins, tile
    )


def _composite_vjp_fwd(t_xy, t_a, t_rgb, t_i00, t_i01, t_i11, origins, tile):
    out = _composite_tiles_pallas(
        t_xy, t_a, t_rgb, t_i00, t_i01, t_i11, origins, tile
    )
    return out, (t_xy, t_a, t_rgb, t_i00, t_i01, t_i11, origins)


def _composite_vjp_bwd(tile, res, ct):
    # backward through the mathematically-identical XLA scan (early
    # termination only skips sub-1/255-transmittance tails, a <=0.4%
    # forward difference that the loss gradient tolerates)
    _, vjp = jax.vjp(lambda *a: _composite_tiles_xla(*a, tile=tile), *res)
    return vjp(ct)


_composite_pallas_vjp.defvjp(_composite_vjp_fwd, _composite_vjp_bwd)


def _composite_tiles_pallas(t_xy, t_a, t_rgb, t_i00, t_i01, t_i11,
                            origins, tile: int, interpret: bool = False):
    """(n_tiles, cap) gathered attributes -> (n_tiles, P, 3) color +
    (n_tiles, P) transmittance via the Pallas kernel (_NT tiles per
    program, attributes transposed to (cap, n_tiles))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles, cap = t_a.shape
    P = tile * tile
    nt_pad = ((n_tiles + _NT - 1) // _NT) * _NT
    pad = nt_pad - n_tiles

    def prep(a):  # (n_tiles, cap) -> (cap, nt_pad)
        a = a.T
        if pad:
            a = jnp.concatenate([a, jnp.zeros((cap, pad), a.dtype)], axis=1)
        return a

    ins = [
        prep(t_xy[..., 0]), prep(t_xy[..., 1]), prep(t_a),
        prep(t_rgb[..., 0]), prep(t_rgb[..., 1]), prep(t_rgb[..., 2]),
        prep(t_i00), prep(t_i01), prep(t_i11),
    ]
    org = jnp.zeros((8, nt_pad), jnp.float32)
    org = org.at[0, :n_tiles].set(origins[:, 0].astype(jnp.float32))
    org = org.at[1, :n_tiles].set(origins[:, 1].astype(jnp.float32))

    kern = partial(_composite_kernel, cap=cap, tile=tile)
    attr_spec = pl.BlockSpec((cap, _NT), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((P, _NT), lambda i: (0, i), memory_space=pltpu.VMEM)
    cr, cg, cb, T = pl.pallas_call(
        kern,
        grid=(nt_pad // _NT,),
        in_specs=[attr_spec] * 9 + [
            pl.BlockSpec((8, _NT), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((P, nt_pad), jnp.float32)] * 4,
        interpret=interpret,
    )(*ins, org)
    color = jnp.stack([cr, cg, cb], axis=-1).transpose(1, 0, 2)[:n_tiles]
    return color, T.T[:n_tiles]


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
