"""3D Gaussian splatting trainer (splatfacto-style).

Parity: /root/reference/gtsfm/splat/gaussian_splatting.py:30-70 (config:
SfM-point init, SSIM+L1 loss, densify/cull strategy, SH schedule) built on
the JAX rasterizer in splat/rendering.py instead of gsplat CUDA.

TPU-first: one jitted Adam step over (means, log_scales, quats,
opacity_logit, colors); densify/cull run host-side every N steps by
rewriting the padded gaussian slots (alive mask), so all jit shapes are
static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.splat.gs_data import GSData
from gtsfm_tpu.splat.rendering import render, render_tiled


class GSTrainOptions(NamedTuple):
    iterations: int = 1000
    lr_means: float = 1.6e-3
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacity: float = 5e-2
    lr_colors: float = 2.5e-2
    ssim_lambda: float = 0.2
    densify_every: int = 300
    cull_opacity: float = 0.05
    densify_grad_threshold: float = 5e-4
    max_gaussians: int = 50_000
    chunk: int = 256
    # tile-binned rasterizer (gsplat algorithm): ~100x less math per
    # image once gaussian count >> per-tile density; the brute path is
    # kept for tiny scenes / exact references
    use_tiled: bool = True
    per_tile_cap: int = 512


def _ssim(a: jnp.ndarray, b: jnp.ndarray, window: int = 7) -> jnp.ndarray:
    """Mean SSIM over (H, W, 3) images (uniform window)."""
    k = jnp.ones((window, window)) / (window * window)

    def box(img):
        return jax.vmap(
            lambda ch: jax.lax.conv_general_dilated(
                ch[None, None], k[None, None], (1, 1), "SAME"
            )[0, 0],
            in_axes=-1, out_axes=-1,
        )(img)

    mu_a = box(a)
    mu_b = box(b)
    var_a = box(a * a) - mu_a**2
    var_b = box(b * b) - mu_b**2
    cov = box(a * b) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    ssim = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(ssim)


class GaussianSplatting:
    """train(data, images) -> (GSData, metrics). images: (N, H, W, 3) or
    (N, H, W) float [0,1] aligned with data's camera indexing."""

    def __init__(self, options: GSTrainOptions = GSTrainOptions()):
        self.options = options

    def train(self, data: SfmData, images: np.ndarray, seed: int = 0, gs_init=None):
        """gs_init: optional GSData to start from (e.g. the AnySplat-style
        feed-forward depth lift, scene/cluster_feedforward.depth_to_splats)
        instead of the sparse-point init."""
        opts = self.options
        imgs = np.asarray(images, np.float32)
        if imgs.ndim == 3:
            imgs = np.repeat(imgs[..., None], 3, axis=-1)
        n, H, W, _ = imgs.shape
        pose_mask = np.asarray(data.pose_mask)
        cam_ids = np.nonzero(pose_mask)[0]

        if gs_init is not None:
            gs = gs_init
        else:
            # init from sparse points
            tm = np.asarray(data.track_mask)
            pts = np.asarray(data.points)[tm]
            G = min(opts.max_gaussians, max(len(pts) * 4, 256))
            gs = GSData.from_points(pts, max_gaussians=G)
        G = gs.max_gaussians

        Ks = np.asarray(data.cal.K())
        poses = data.poses

        params = {
            "means": gs.means, "log_scales": gs.log_scales, "quats": gs.quats,
            "opacity_logit": gs.opacity_logit, "colors": gs.colors,
        }
        alive = gs.alive
        tx = optax.multi_transform(
            {
                "means": optax.adam(opts.lr_means),
                "log_scales": optax.adam(opts.lr_scales),
                "quats": optax.adam(opts.lr_quats),
                "opacity_logit": optax.adam(opts.lr_opacity),
                "colors": optax.adam(opts.lr_colors),
            },
            {k: k for k in params},
        )
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, alive, cam_idx, target):
            def loss_fn(p):
                g = GSData(alive=alive, **p)
                wTc = SE3(R=poses.R[cam_idx], t=poses.t[cam_idx])
                if opts.use_tiled:
                    img, _ = render_tiled(
                        g, wTc, jnp.asarray(Ks)[cam_idx], H, W,
                        per_tile_cap=opts.per_tile_cap,
                    )
                else:
                    img, _ = render(
                        g, wTc, jnp.asarray(Ks)[cam_idx], H, W, chunk=opts.chunk
                    )
                l1 = jnp.mean(jnp.abs(img - target))
                ssim = _ssim(img, target)
                return (1 - opts.ssim_lambda) * l1 + opts.ssim_lambda * (1 - ssim), l1

            (loss, l1), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            grad_mag = jnp.linalg.norm(grads["means"], axis=-1)
            return params, opt_state, loss, l1, grad_mag

        rng = np.random.default_rng(seed)
        losses = []
        grad_accum = np.zeros(G, np.float64)
        for it in range(opts.iterations):
            ci = int(rng.choice(cam_ids))
            target = jnp.asarray(imgs[ci])
            params, opt_state, loss, l1, gmag = step(
                params, opt_state, alive, jnp.asarray(ci), target
            )
            losses.append(float(l1))
            grad_accum += np.asarray(gmag)

            if (it + 1) % opts.densify_every == 0 and it + 1 < opts.iterations:
                params, alive = self._densify_cull(params, alive, grad_accum / opts.densify_every)
                grad_accum[:] = 0
                opt_state = tx.init(params)  # reset moments after topology change

        gs_out = GSData(alive=alive, **params)
        metrics = {
            "final_l1": float(np.mean(losses[-20:])),
            "initial_l1": float(np.mean(losses[:20])),
            "num_gaussians": int(np.asarray(alive).sum()),
            "iterations": opts.iterations,
        }
        return gs_out, metrics

    def _densify_cull(self, params, alive, grad_avg):
        """Cull low-opacity; clone high-gradient gaussians into dead slots."""
        opts = self.options
        alive_np = np.asarray(alive).copy()
        op = 1.0 / (1.0 + np.exp(-np.asarray(params["opacity_logit"])))
        cull = alive_np & (op < opts.cull_opacity)
        alive_np[cull] = False

        dead_slots = np.nonzero(~alive_np)[0]
        cand = np.nonzero(alive_np & (grad_avg > opts.densify_grad_threshold))[0]
        cand = cand[np.argsort(-grad_avg[cand])][: len(dead_slots)]
        if len(cand):
            slots = dead_slots[: len(cand)]
            new_params = {k: np.asarray(v).copy() for k, v in params.items()}
            for k in new_params:
                new_params[k][slots] = new_params[k][cand]
            # split: shrink both copies, jitter the clone
            new_params["log_scales"][slots] -= np.log(1.6)
            new_params["log_scales"][cand] -= np.log(1.6)
            jit = np.exp(new_params["log_scales"][slots]) * np.random.default_rng(0).normal(
                0, 0.5, (len(slots), 3)
            )
            new_params["means"][slots] += jit.astype(np.float32)
            alive_np[slots] = True
            params = {k: jnp.asarray(v) for k, v in new_params.items()}
        return params, jnp.asarray(alive_np)
