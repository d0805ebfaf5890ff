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
    alpha (G,), rgb (G, 3)).

    The J Σ Jᵀ chain is fully unrolled into (G,)-vector lane math: batched
    (G, 3, 3) matmuls pad each 3-wide contraction onto 128-wide MXU tiles
    (measured 7 ms at G=100k on v5e); the unrolled form is pure VPU and
    runs in well under 1 ms.
    """
    cTw = wTc.inverse()
    p_cam = cTw.transform(gs.means)  # (G, 3)
    z = p_cam[..., 2]
    # behind-camera gaussians are masked invisible downstream (z > 0.01);
    # give them a PLACEHOLDER depth so no intermediate overflows f32 —
    # an inf reached through any jnp.where still poisons gradients
    # (0-cotangent * inf = NaN)
    z_safe = jnp.where(z > 1e-6, z, 1.0)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    # clip normalized coords to a generous frustum: gaussians thousands of
    # image-widths off-screen keep finite (and irrelevant) covariances
    x = jnp.clip(p_cam[..., 0] / z_safe, -1e4, 1e4)
    y = jnp.clip(p_cam[..., 1] / z_safe, -1e4, 1e4)
    xy = jnp.stack([fx * x + cx, fy * y + cy], axis=-1)

    # A = R_cam_world @ R_gauss, unrolled over the shared 3x3 (27 fma on
    # (G,) lanes); rows of A as three (G, 3) tuples
    Rg = _quat_to_R(gs.quats)  # (G, 3, 3)
    Wr = cTw.R  # (3, 3) shared
    A = [
        [
            Wr[i, 0] * Rg[:, 0, k] + Wr[i, 1] * Rg[:, 1, k] + Wr[i, 2] * Rg[:, 2, k]
            for k in range(3)
        ]
        for i in range(3)
    ]
    # B = J @ A with J = [[fx/z, 0, -fx x/z], [0, fy/z, -fy y/z]]
    j0, j2x = fx / z_safe, fx * x / z_safe
    j1, j2y = fy / z_safe, fy * y / z_safe
    B0 = [j0 * A[0][k] - j2x * A[2][k] for k in range(3)]
    B1 = [j1 * A[1][k] - j2y * A[2][k] for k in range(3)]
    # cov2d = B diag(s^2) Bᵀ + 0.3 I (low-pass / anti-alias dilation).
    # Degenerate near-camera giants (an e^8-scale gaussian at z=0.02) can
    # overflow det/inversion in f32 and poison gradients; rescaling the
    # WHOLE matrix by a shared factor preserves positive-definiteness
    # (independent entry clipping would not) and a capped halo is already
    # flat across any tile, so the render is visually unchanged.
    s2 = jnp.exp(2.0 * gs.log_scales)  # (G, 3)
    c00 = sum(B0[k] * B0[k] * s2[:, k] for k in range(3))
    c01 = sum(B0[k] * B1[k] * s2[:, k] for k in range(3))
    c11 = sum(B1[k] * B1[k] * s2[:, k] for k in range(3))
    cap = 1e8
    # f32-overflowed entries (e.g. a padded gaussian at z ~ 0) degrade to
    # the isotropic cap — inf would turn the shared rescale into inf * 0
    c00 = jnp.where(jnp.isfinite(c00), c00, cap)
    c11 = jnp.where(jnp.isfinite(c11), c11, cap)
    c01 = jnp.where(jnp.isfinite(c01), c01, 0.0)
    m = jnp.maximum(jnp.maximum(c00, c11), 1.0)
    # the cap is a numerical guard, not model semantics: stop its gradient
    # (d(cap/m)/dm overflows f32 for e20-scale m; for healthy gaussians
    # f_cap == 1 exactly and gradients are untouched)
    f_cap = jax.lax.stop_gradient(jnp.minimum(1.0, cap / m))
    c00 = c00 * f_cap + 0.3
    c01 = c01 * f_cap
    c11 = c11 * f_cap + 0.3
    cov2d = jnp.stack(
        [jnp.stack([c00, c01], -1), jnp.stack([c01, c11], -1)], axis=-2
    )  # (G, 2, 2)

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
        # the quadratic form is mathematically >= 0; f32 cancellation on
        # capped near-singular covariances can leave it hugely negative,
        # and exp(+big) * (alpha == 0) would leak NaN through the cutoff
        q = jnp.maximum(q, 0.0)
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
    max_dup: int = 9,
):
    """Tile-binned rasterization (public wrapper).

    The sort key packs (tile_id, quantized_depth) into int32 (x64 is
    disabled under jit): the tile grid takes ceil(log2(n_tiles + 2)) high
    bits and depth the remaining low bits, as the top `rank_bits` bits of
    the f32 depth's bit pattern — monotone for positive floats, so no
    argsort/rank pass is needed and the key budget is independent of G.
    Depths equal in the top ~12-22 bits (relative gap below ~2^-4 of a
    binade) composite in gaussian-index order instead of exact depth
    order — an invisible reordering of near-coincident splats.

    max_dup bounds the binning sort to G*max_dup keys; the default 3x3
    window is lossless for any footprint spanning <= 3 tiles per axis
    (everything in a converged reconstruction — at 100k gaussians the
    p100 span is 3) and drops only the far halo of larger footprints
    (the window stays centered where alpha is largest). Raise it for
    scenes with huge near-camera gaussians.
    """
    ny = -(-height // tile)
    nx = -(-width // tile)
    # tile ids must stay strictly below the reserved invalid decode value
    tile_bits = max(1, (ny * nx + 2).bit_length())
    rank_bits = 31 - tile_bits
    if rank_bits < 8:  # absurd grid (> ~8M tiles): dense fallback
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
    max_dup: int = 9,
    rank_bits: int = 20,
):
    """Tile-binned rasterization — the gsplat algorithm, XLA-native.

    Parity: /root/reference/gtsfm/splat/rendering.py:14 (gsplat CUDA
    tile rasterizer). render() evaluates every gaussian at every pixel
    (O(H*W*G)); this builds per-tile gaussian lists so each 16x16 tile
    composites only the gaussians whose 3-sigma bbox overlaps it —
    ~100-1000x less math at 100k-1M gaussians. TPU mapping:

      * binning = ONE device-wide sort of (tile_id, quantized-depth)
        packed int32 keys over G*max_dup duplicated entries (no atomics/
        scatter: the CUDA kernel's per-tile atomic lists become a sort +
        two searchsorted boundary lookups). Depth enters the key as the
        top rank_bits of the f32 bit pattern (monotone for positive
        floats) — no argsort/rank pass, and key capacity is independent
        of G;
      * each tile takes its first per_tile_cap gaussians front-to-back
        (the CUDA kernel's early saturation termination becomes a static
        cap — farther gaussians behind an almost-opaque prefix);
      * compositing runs in a Pallas kernel on TPU (tiles across lanes,
        VMEM-resident attributes) and a lax.scan over capacity chunks of
        a dense (n_tiles, chunk, tile*tile) tensor elsewhere.

    Constraint (asserted): the tile grid fits the 31 - rank_bits high key
    bits (the wrapper guarantees it).
    """
    th = tw = tile
    ny = (height + th - 1) // th
    nx = (width + tw - 1) // tw
    n_tiles = ny * nx
    G = gs.max_gaussians
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
    # evaluation cutoff so binning never drops an evaluated pixel). The
    # radius only selects TILES (a discrete decision): stop its gradient —
    # sqrt(mid^2 - det) has an infinite derivative at exactly-isotropic
    # covariances (which the numerical cap produces), and a binning
    # gradient is meaningless anyway.
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jax.lax.stop_gradient(4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

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

    # quantized depth (front first) shared by all duplicates: the top
    # rank_bits of the positive-f32 bit pattern are monotone in z, so the
    # argsort + rank-scatter pass of a rank-based key is unnecessary; ties
    # (relative depth gap below the kept mantissa bits) fall back to
    # stable gaussian-index order
    zbits = jax.lax.bitcast_convert_type(jnp.maximum(z, 1e-30), jnp.int32)
    depth_q = jax.lax.shift_right_logical(zbits, 31 - rank_bits)
    key = jnp.where(
        dup_ok,
        tile_id * (1 << rank_bits) + depth_q[:, None],
        jnp.iinfo(jnp.int32).max,
    ).reshape(-1)
    # one multi-operand sort carries the gaussian index alongside the key
    # (an argsort would pay a second (key, iota) pass + an extra gather)
    gauss_of_dup = (
        jnp.arange(G * max_dup, dtype=jnp.int32) // max_dup
    )
    sorted_key, sorted_gauss = jax.lax.sort((key, gauss_of_dup), num_keys=1)
    sorted_tile = sorted_key >> rank_bits  # invalid entries decode past n_tiles

    # per-tile segment [st, en) in the sorted order. The per-tile window is
    # a CONTIGUOUS span, so it loads as a vmapped dynamic_slice — measured
    # 2.4x faster than the equivalent (n_tiles, cap) element gather on v5e
    # (the width-1 gather path runs ~8.7 ms/M-row vs 3.6 for slices). The
    # cap-row zero pad keeps clamped starts exact for segments ending at N.
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    st = jnp.searchsorted(sorted_tile, tids, side="left")
    en = jnp.searchsorted(sorted_tile, tids, side="right")
    sg_pad = jnp.concatenate(
        [sorted_gauss, jnp.zeros(per_tile_cap, jnp.int32)]
    )
    gidx = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sg_pad, (s,), (per_tile_cap,))
    )(st)  # (n_tiles, cap)

    # per-tile gaussian attributes travel as ONE packed row per gaussian —
    # the (n_tiles*cap)-row gather, not the sort, dominates binning on TPU
    # and its cost scales with gathered ELEMENT count
    packed = jnp.stack(
        [xy[:, 0], xy[:, 1], alpha, rgb[:, 0], rgb[:, 1], rgb[:, 2],
         inv00, inv01, inv11], axis=-1
    )  # (G, 9)
    counts = jnp.clip(en - st, 0, per_tile_cap).astype(jnp.int32)

    origins = jnp.stack(
        [(tids % nx) * tw, (tids // nx) * th], axis=-1
    ).astype(jnp.int32)
    if jax.default_backend() == "tpu":
        # Pallas per-tile kernel forward: the gather moves 2 f32 + 4
        # bf16-pair int32 elements per row (vs 9 f32) and compositing runs
        # entirely in VMEM with gsplat's early saturation termination;
        # gradients flow through the f32 XLA formulation via custom VJP
        color, T = _tiled_composite(packed, gidx, counts, origins, th)
    else:
        color, T = _composite_tiles_xla(
            *_gather_attrs_f32(packed, gidx, counts), origins, th
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

_HI_MASK = -65536  # 0xFFFF0000 as a python int (a jnp scalar here would be
# captured as a pallas-kernel constant, which pallas_call rejects)


def _bf16_bits(v: jnp.ndarray) -> jnp.ndarray:
    """f32 -> int32 bit pattern rounded to bf16 (low 16 bits zero)."""
    b = jax.lax.bitcast_convert_type(v, jnp.int32)
    b = b + 0x7FFF + ((b >> 16) & 1)  # round to nearest even
    return b & _HI_MASK


def _pack2(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two f32 -> one int32 carrying (bf16(hi) | bf16(lo) >> 16)."""
    return _bf16_bits(hi) | jax.lax.shift_right_logical(_bf16_bits(lo), 16)


def _unpack2(p: jnp.ndarray) -> tuple:
    """int32 -> (hi f32, lo f32): exact expansion of the two bf16 halves."""
    hi = jax.lax.bitcast_convert_type(p & _HI_MASK, jnp.float32)
    lo = jax.lax.bitcast_convert_type(jax.lax.shift_left(p, 16), jnp.float32)
    return hi, lo


def _composite_kernel(ax_ref, ay_ref, aa_ref, p0_ref, p1_ref, p2_ref,
                      org_ref, cr_ref, cg_ref, cb_ref, t_ref,
                      *, cap: int, tile: int):
    """One grid program composites _NT tiles in parallel across the lane
    axis: sequential front-to-back over the (depth-sorted) gaussian slot
    axis, vectorized over (pixels x tiles) = (tile^2, _NT) registers, with
    gsplat's early saturation termination. Attribute layout: (cap, _NT) —
    slot g of every tile is one lane vector, so the inner loop is pure
    (P, _NT) VPU math with no HBM traffic. xy and alpha ride as f32
    (alpha quantization would compound through the transmittance
    product); (r, g), (b, i00), (i01, i11) ride as bf16 pairs packed in
    int32 and are expanded lanewise with bitcast/shift — cutting the
    upstream gather's element count from 9 to 6 per row."""
    P = tile * tile
    CH = 8  # gaussian slots per chunk (one sublane tile of attributes)
    n_chunks = cap // CH
    ox = org_ref[0, :].astype(jnp.float32)  # (_NT,)
    oy = org_ref[1, :].astype(jnp.float32)
    count = org_ref[2, :]  # valid slots per tile (int32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, _NT), 0)
    pix_x = ox[None, :] + (pix % tile).astype(jnp.float32)
    pix_y = oy[None, :] + (pix // tile).astype(jnp.float32)

    def cond(carry):
        c, T, _cr, _cg, _cb = carry
        # a tile is live while it still has valid slots AND is not
        # saturated; empty/padded tiles (count 0) never stall the loop
        has_work = (c * CH) < count  # (_NT,)
        t_alive = jnp.max(T, axis=0) > 1.0 / 255.0
        return (c < n_chunks) & jnp.any(has_work & t_alive)

    def body(carry):
        c, T, cr, cg, cb = carry
        s = c * CH
        x_c = ax_ref[pl.ds(s, CH), :]  # (CH, _NT) single sublane-tile loads
        y_c = ay_ref[pl.ds(s, CH), :]
        a_c = aa_ref[pl.ds(s, CH), :]
        r_c, g_c = _unpack2(p0_ref[pl.ds(s, CH), :])
        b_c, i00_c = _unpack2(p1_ref[pl.ds(s, CH), :])
        i01_c, i11_c = _unpack2(p2_ref[pl.ds(s, CH), :])
        a_c = jnp.where(
            (s + jax.lax.broadcasted_iota(jnp.int32, (CH, _NT), 0))
            < count[None, :],
            a_c, 0.0,
        )
        for j in range(CH):  # front-to-back within the chunk (unrolled)
            dx = pix_x - x_c[j][None, :]  # (P, _NT)
            dy = pix_y - y_c[j][None, :]
            q = (
                i00_c[j][None, :] * dx * dx
                + 2.0 * i01_c[j][None, :] * dx * dy
                + i11_c[j][None, :] * dy * dy
            )
            q = jnp.maximum(q, 0.0)  # f32 cancellation guard (see render())
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
        q = jnp.maximum(q, 0.0)  # f32 cancellation guard (see render())
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


def _gather_attrs_f32(packed, gidx, counts):
    """f32 reference gather: (G, 9) rows -> per-tile (n_tiles, cap)
    attribute tables for the XLA compositing formulation (CPU forward and
    the custom VJP's backward)."""
    cap = gidx.shape[1]
    t_attr = packed[gidx]  # (n_tiles, cap, 9)
    slot_ok = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
    t_a = jnp.where(slot_ok, t_attr[..., 2], 0.0)
    return (t_attr[..., 0:2], t_a, t_attr[..., 3:6], t_attr[..., 6],
            t_attr[..., 7], t_attr[..., 8])


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _tiled_composite(packed, gidx, counts, origins, tile: int):
    """(G, 9) per-gaussian attributes + per-tile slot indices -> composited
    (n_tiles, P, 3) color + (n_tiles, P) transmittance.

    The custom-VJP boundary sits ABOVE the gather so the TPU forward can
    gather bf16-packed attributes (6 int32-equivalent elements per row vs
    9 f32 — gather cost scales with element count); the backward re-runs
    the f32 gather + XLA scan and differentiates through both."""
    return _composite_tiles_pallas(packed, gidx, counts, origins, tile)


def _tiled_composite_fwd(packed, gidx, counts, origins, tile):
    out = _composite_tiles_pallas(packed, gidx, counts, origins, tile)
    return out, (packed, gidx, counts, origins)


def _tiled_composite_bwd(tile, res, ct):
    # backward through the mathematically-identical XLA scan (early
    # termination only skips sub-1/255-transmittance tails and the bf16
    # attribute quantization is <= 0.2% — differences the loss gradient
    # tolerates)
    packed, gidx, counts, origins = res
    _, vjp = jax.vjp(
        lambda p: _composite_tiles_xla(
            *_gather_attrs_f32(p, gidx, counts), origins, tile
        ),
        packed,
    )
    (d_packed,) = vjp(ct)
    return d_packed, None, None, None


_tiled_composite.defvjp(_tiled_composite_fwd, _tiled_composite_bwd)


def _composite_tiles_pallas(packed, gidx, counts, origins, tile: int,
                            interpret: bool = False):
    """Pack -> gather -> Pallas kernel (_NT tiles per program, attributes
    transposed to (cap, n_tiles))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles, cap = gidx.shape
    P = tile * tile
    nt_pad = ((n_tiles + _NT - 1) // _NT) * _NT
    pad = nt_pad - n_tiles

    # bf16-pair packing per gaussian, BEFORE the big gather (xy and alpha
    # stay f32: alpha quantization compounds through the transmittance).
    # All six elements ride ONE width-6 int32 row gather — a second width-3
    # gather would double the cost (row-gather time is flat in width up to
    # ~6 on v5e, so one wide gather is free relative to a narrow one).
    allp = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(packed[:, 0:3], jnp.int32),
            jnp.stack(
                [
                    _pack2(packed[:, 3], packed[:, 4]),  # (r, g)
                    _pack2(packed[:, 5], packed[:, 6]),  # (b, i00)
                    _pack2(packed[:, 7], packed[:, 8]),  # (i01, i11)
                ],
                axis=-1,
            ),
        ],
        axis=-1,
    )  # int32 (G, 6)
    t_all = allp[gidx]  # (n_tiles, cap, 6)
    t_xya = jax.lax.bitcast_convert_type(t_all[..., 0:3], jnp.float32)
    t_pk = t_all[..., 3:6]

    def prep(a):  # (n_tiles, cap) -> (cap, nt_pad)
        a = a.T
        if pad:
            a = jnp.concatenate([a, jnp.zeros((cap, pad), a.dtype)], axis=1)
        return a

    ins = [
        prep(t_xya[..., 0]), prep(t_xya[..., 1]), prep(t_xya[..., 2]),
        prep(t_pk[..., 0]), prep(t_pk[..., 1]), prep(t_pk[..., 2]),
    ]
    org = jnp.zeros((8, nt_pad), jnp.int32)
    org = org.at[0, :n_tiles].set(origins[:, 0])
    org = org.at[1, :n_tiles].set(origins[:, 1])
    org = org.at[2, :n_tiles].set(counts)

    kern = partial(_composite_kernel, cap=cap, tile=tile)
    attr_spec = pl.BlockSpec((cap, _NT), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((P, _NT), lambda i: (0, i), memory_space=pltpu.VMEM)
    cr, cg, cb, T = pl.pallas_call(
        kern,
        grid=(nt_pad // _NT,),
        in_specs=[attr_spec] * 6 + [
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
