"""DoG keypoint detector + SIFT-style descriptor, pure JAX.

Parity: /root/reference/gtsfm/frontend/detector_descriptor/sift.py (OpenCV
SIFT detect_and_describe) and detector/dog.py — re-implemented as a
TPU-native batched kernel instead of a host OpenCV call (the reference
build plan, SURVEY §7.4, requires a native DoG+descriptor kernel).

Design notes (static shapes throughout):
  * fixed octave/scale counts; per-level keypoint budgets (K / num_levels)
    keep every downstream shape static and spread detections across scales;
  * extrema detection is a 26-neighbor comparison stack (VPU elementwise);
  * descriptors use dense triangular soft-binning — one einsum per keypoint
    batch instead of scatter-adds — and bilinear gather sampling;
  * everything vmaps over keypoints and jit-compiles once per image shape.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsfm_tpu.common.keypoints import Keypoints


class DoGSiftOptions(NamedTuple):
    max_keypoints: int = 2048
    num_octaves: int = 4
    scales_per_octave: int = 3
    sigma0: float = 1.6
    contrast_threshold: float = 0.015
    edge_ratio: float = 10.0
    descriptor_width: int = 4  # 4x4 spatial bins
    descriptor_bins: int = 8  # orientation bins
    patch_grid: int = 16  # sampling grid for the descriptor


def _gaussian_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of an (H, W) image (edge padding)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    k = _gaussian_kernel(sigma, radius)
    img_p = jnp.pad(img, ((0, 0), (radius, radius)), mode="edge")
    img_r = jax.lax.conv_general_dilated(
        img_p[None, None, :, :], k[None, None, None, :], (1, 1), "VALID",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    img_p = jnp.pad(img_r, ((radius, radius), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        img_p[None, None, :, :], k[None, None, :, None], (1, 1), "VALID",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def _detect_octave(gauss: jnp.ndarray, opts: DoGSiftOptions) -> jnp.ndarray:
    """gauss: (S+3, H, W) -> extremum score maps (S, H, W)."""
    dog = gauss[1:] - gauss[:-1]  # (S+2, H, W)
    S = opts.scales_per_octave
    center = dog[1 : S + 1]

    def shift2(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(-2, -1))

    is_max = jnp.ones_like(center, dtype=bool)
    is_min = jnp.ones_like(center, dtype=bool)
    for ds in (-1, 0, 1):
        nb_stack = dog[1 + ds : S + 1 + ds]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                nb = shift2(nb_stack, dy, dx)
                is_max &= center > nb
                is_min &= center < nb
    extremum = is_max | is_min
    contrast_ok = jnp.abs(center) > opts.contrast_threshold

    dxx = shift2(center, 0, 1) + shift2(center, 0, -1) - 2 * center
    dyy = shift2(center, 1, 0) + shift2(center, -1, 0) - 2 * center
    dxy = 0.25 * (
        shift2(center, 1, 1) + shift2(center, -1, -1)
        - shift2(center, 1, -1) - shift2(center, -1, 1)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = opts.edge_ratio
    edge_ok = (det > 0) & (tr**2 * r < (r + 1) ** 2 * det)

    H, W = center.shape[-2:]
    border = 8
    yy = jnp.arange(H)
    xx = jnp.arange(W)
    inb = (
        (yy[:, None] >= border) & (yy[:, None] < H - border)
        & (xx[None, :] >= border) & (xx[None, :] < W - border)
    )
    return jnp.where(extremum & contrast_ok & edge_ok & inb[None], jnp.abs(center), 0.0)


def _tri(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Linear (triangular) kernel weights |x - c| -> (len(x), len(centers))."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - centers[None, :]))


def _tri_circular(x: jnp.ndarray, n: int) -> jnp.ndarray:
    c = jnp.arange(n, dtype=x.dtype)
    d = jnp.abs(x[:, None] - c[None, :])
    d = jnp.minimum(d, n - d)
    return jnp.maximum(0.0, 1.0 - d)


def _descriptors_at(gauss_img, kp_xy, kp_sigma, opts: DoGSiftOptions):
    """SIFT-style descriptors at given keypoints on one image.

    gauss_img: (H, W); kp_xy: (K, 2) in this image's pixels; kp_sigma: (K,).
    Returns (K, nw*nw*nb) L2-normalized descriptors.
    """
    H, W = gauss_img.shape
    gy, gx = jnp.gradient(gauss_img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)

    G = opts.patch_grid
    nb = opts.descriptor_bins
    nw = opts.descriptor_width

    lin = (jnp.arange(G, dtype=jnp.float32) - (G - 1) / 2.0) / (G / 2.0)  # [-1, 1)
    off_y, off_x = jnp.meshgrid(lin, lin, indexing="ij")
    off_y = off_y.reshape(-1)
    off_x = off_x.reshape(-1)
    spatial_w = jnp.exp(-(off_y**2 + off_x**2) / (2 * 0.5**2))

    def bilinear(img, y, x):
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        wy = jnp.clip(y - y0, 0.0, 1.0)
        wx = jnp.clip(x - x0, 0.0, 1.0)
        v00 = img[y0, x0]
        v01 = img[y0, x0 + 1]
        v10 = img[y0 + 1, x0]
        v11 = img[y0 + 1, x0 + 1]
        return v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx + v10 * wy * (1 - wx) + v11 * wy * wx

    def one_kp(xy, sigma):
        radius = 6.0 * sigma
        ys = xy[1] + off_y * radius  # (P,)
        xs = xy[0] + off_x * radius
        m = bilinear(mag, ys, xs)
        a = bilinear(ang, ys, xs)
        w = spatial_w * m

        # orientation assignment (36-bin circular histogram, smoothed)
        nb_o = 36
        bins_o = (a + jnp.pi) / (2 * jnp.pi) * nb_o
        hist = jnp.sum(w[:, None] * _tri_circular(bins_o, nb_o), axis=0)
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        peak = jnp.argmax(hist)
        theta = (peak.astype(jnp.float32) + 0.5) / nb_o * 2 * jnp.pi - jnp.pi

        # rotate grid and angles by -theta
        a_rel = jnp.mod(a - theta + jnp.pi, 2 * jnp.pi)
        cos_t, sin_t = jnp.cos(-theta), jnp.sin(-theta)
        ry = off_y * cos_t + off_x * sin_t
        rx = -off_y * sin_t + off_x * cos_t

        by = (ry + 1.0) * 0.5 * nw - 0.5
        bx = (rx + 1.0) * 0.5 * nw - 0.5
        bo = a_rel / (2 * jnp.pi) * nb

        wy_b = _tri(by, jnp.arange(nw, dtype=jnp.float32))  # (P, nw)
        wx_b = _tri(bx, jnp.arange(nw, dtype=jnp.float32))
        wo_b = _tri_circular(bo, nb)  # (P, nb)
        desc = jnp.einsum("p,pi,pj,pk->ijk", w, wy_b, wx_b, wo_b)

        v = desc.reshape(-1)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        v = jnp.minimum(v, 0.2)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        return v

    return jax.vmap(one_kp)(kp_xy, kp_sigma)


@partial(jax.jit, static_argnames=("opts",))
def detect_and_describe(image: jnp.ndarray, opts: DoGSiftOptions = DoGSiftOptions()):
    """image: (H, W) grayscale f32 in [0, 1].

    Returns (Keypoints (K,), descriptors (K, nw*nw*nb)), K = max_keypoints.
    Coordinates are (x, y) in input pixels.
    """
    S = opts.scales_per_octave
    n_levels = opts.num_octaves * S
    k_per_level = max(1, opts.max_keypoints // n_levels)

    img = image
    base_sigmas = [opts.sigma0 * (2.0 ** (s / S)) for s in range(S + 3)]

    kp_list, desc_list = [], []
    for o in range(opts.num_octaves):
        H, W = img.shape
        gauss = jnp.stack([_blur(img, s) for s in base_sigmas])
        score = _detect_octave(gauss, opts)  # (S, H, W)
        scale_mult = 2.0**o
        for s in range(S):
            flat = score[s].reshape(-1)
            top_scores, top_idx = jax.lax.top_k(flat, k_per_level)
            ys = (top_idx // W).astype(jnp.float32)
            xs = (top_idx % W).astype(jnp.float32)
            valid = top_scores > 0
            sigma_oct = base_sigmas[s + 1]
            kp_xy_oct = jnp.stack([xs, ys], axis=-1)
            desc = _descriptors_at(
                gauss[s + 1], kp_xy_oct, jnp.full(k_per_level, sigma_oct), opts
            )
            kp_list.append(
                (
                    kp_xy_oct * scale_mult,
                    jnp.full(k_per_level, sigma_oct * scale_mult),
                    top_scores,
                    valid,
                )
            )
            desc_list.append(desc)
        img = jax.image.resize(gauss[S], (H // 2, W // 2), "linear")

    coords = jnp.concatenate([k[0] for k in kp_list])
    sigmas = jnp.concatenate([k[1] for k in kp_list])
    scores = jnp.concatenate([k[2] for k in kp_list])
    valids = jnp.concatenate([k[3] for k in kp_list])
    descs = jnp.concatenate(desc_list)

    # final global top-K by response (stable across budgets); pad so the
    # output is exactly (K,) regardless of per-level budget rounding
    K = opts.max_keypoints
    total = scores.shape[0]
    if total < K:
        pad = K - total
        coords = jnp.concatenate([coords, jnp.zeros((pad, 2))])
        sigmas = jnp.concatenate([sigmas, jnp.ones(pad)])
        scores = jnp.concatenate([scores, jnp.full(pad, -1.0)])
        valids = jnp.concatenate([valids, jnp.zeros(pad, bool)])
        descs = jnp.concatenate([descs, jnp.zeros((pad, descs.shape[1]))])
    sel_scores, sel = jax.lax.top_k(jnp.where(valids, scores, -1.0), K)
    kps = Keypoints.create(
        coordinates=coords[sel],
        scales=sigmas[sel],
        responses=jnp.maximum(sel_scores, 0.0),
        mask=sel_scores > 0,
    )
    return kps, descs[sel]


class DoGSift:
    """Detector-descriptor front-end component (drop-in for the reference's
    SIFT detector_descriptor). detect_and_describe(image) -> (Keypoints,
    descriptors); batched over images via vmap in the pair pipeline."""

    def __init__(self, options: DoGSiftOptions = DoGSiftOptions()):
        self.options = options

    def __call__(self, image: jnp.ndarray):
        return detect_and_describe(image, self.options)
