"""Gaussian splat merging across clusters.

Parity: /root/reference/gtsfm/utils/splat.py (363 LoC, merge_gaussian_splats
used by cluster_merging.py:27-28) and utils/transform.py's Sim3 application
to splats: transform one cluster's splats by the merge Sim3 (means, scales
by s, rotations by R) and concatenate, with near-duplicate culling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import so3
from gtsfm_tpu.geometry.sim3 import Sim3
from gtsfm_tpu.splat.gs_data import GSData


def transform_splats(gs: GSData, sim: Sim3) -> GSData:
    """Apply a Sim3 to splats: means via full Sim3, orientation by R,
    scales multiplied by s."""
    new_means = sim.transform(gs.means)
    Rq = so3.from_quat(gs.quats)
    new_R = jnp.einsum("ij,gjk->gik", sim.R, Rq)
    new_quats = so3.to_quat(new_R)
    new_log_scales = gs.log_scales + jnp.log(sim.s)
    return gs.replace(means=new_means, quats=new_quats, log_scales=new_log_scales)


def merge_gaussian_splats(
    gs_a: GSData, gs_b: GSData, sim_ab: Sim3, dedup_radius_factor: float = 0.5
) -> GSData:
    """Merge cluster b's splats into a's frame.

    b's splats landing within dedup_radius_factor * their own scale of an
    existing a splat are culled (overlap dedup, mirroring the reference's
    merged-splat dedup)."""
    b_moved = transform_splats(gs_b, sim_ab)
    a_alive = np.asarray(gs_a.alive)
    b_alive = np.asarray(b_moved.alive)
    pa = np.asarray(gs_a.means)[a_alive]
    pb = np.asarray(b_moved.means)[b_alive]
    keep_b = np.ones(len(pb), bool)
    if len(pa) and len(pb):
        scale_b = np.exp(np.asarray(b_moved.log_scales)[b_alive]).mean(axis=1)
        # chunked nearest-neighbor distance (host)
        for s in range(0, len(pb), 2048):
            chunk = pb[s : s + 2048]
            d2 = ((chunk[:, None] - pa[None]) ** 2).sum(-1)
            nn = np.sqrt(d2.min(axis=1))
            keep_b[s : s + 2048] = nn > dedup_radius_factor * scale_b[s : s + 2048]

    def cat(field_a, field_b):
        fa = np.asarray(field_a)[a_alive]
        fb = np.asarray(field_b)[b_alive][keep_b]
        return jnp.asarray(np.concatenate([fa, fb]))

    n_total = int(a_alive.sum() + keep_b.sum())
    return GSData(
        means=cat(gs_a.means, b_moved.means),
        log_scales=cat(gs_a.log_scales, b_moved.log_scales),
        quats=cat(gs_a.quats, b_moved.quats),
        opacity_logit=cat(gs_a.opacity_logit, b_moved.opacity_logit),
        colors=cat(gs_a.colors, b_moved.colors),
        alive=jnp.ones(n_total, bool),
    )
