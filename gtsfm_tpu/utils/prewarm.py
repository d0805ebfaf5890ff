"""AOT pre-warm of the standard jit shape set at cluster bring-up.

Parity: the reference pays its model/graph warm-up lazily inside Dask
workers; here the heavy jit programs (two-view pair batch, BA solver,
detector forward) can be compiled AHEAD of the first scene — at bring-up,
in one call — on top of the persistent compilation cache
(utils/compile_cache.py). A warmed cache turns the first production run's
20-40 s of XLA compiles into cache hits; re-warming after a framework
upgrade repopulates it.

Usage:  python -m gtsfm_tpu.utils.prewarm            # standard shape set
        runner --prewarm                             # before the pipeline
        prewarm_standard_shapes(pair_batch=64, ...)  # programmatic
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.utils.compile_cache import enable_persistent_cache
from gtsfm_tpu.utils.logger import get_logger

logger = get_logger("prewarm")


def _lower_two_view(pair_batch: int, max_keypoints: int, desc_dim: int, hypotheses: int):
    from gtsfm_tpu.frontend.two_view import TwoViewOptions, run_two_view_batch
    from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
    from gtsfm_tpu.geometry import Cal3Bundler

    P, K, D = pair_batch, max_keypoints, desc_dim
    cal = Cal3Bundler.create(
        jnp.full(P, 500.0), jnp.zeros(P), jnp.zeros(P), jnp.full(P, 320.0), jnp.full(P, 240.0)
    )
    kwargs = dict(
        kp_xy1=jnp.zeros((P, K, 2)),
        kp_xy2=jnp.zeros((P, K, 2)),
        desc1=jnp.zeros((P, K, D)),
        desc2=jnp.zeros((P, K, D)),
        kp_mask1=jnp.zeros((P, K), bool),
        kp_mask2=jnp.zeros((P, K), bool),
        cal1=cal,
        cal2=cal,
        pair_mask=jnp.zeros(P, bool),
        key=jax.random.PRNGKey(0),
        opts=TwoViewOptions(ransac=RansacOptions(num_hypotheses=hypotheses)),
    )
    return run_two_view_batch.lower(**kwargs)


def _lower_ba(n_cam: int, n_track: int, n_meas: int):
    from gtsfm_tpu.bundle.ba import BAOptions, _optimize_jit, problem_from_sfm_data
    from gtsfm_tpu.common.sfm_data import SfmData
    from gtsfm_tpu.geometry import SE3, Cal3Bundler

    cal = Cal3Bundler.create(
        jnp.full(n_cam, 500.0), jnp.zeros(n_cam), jnp.zeros(n_cam),
        jnp.full(n_cam, 320.0), jnp.full(n_cam, 240.0),
    )
    data = SfmData(
        poses=SE3.identity((n_cam,)),
        pose_mask=jnp.zeros(n_cam, bool),
        cal=cal,
        points=jnp.zeros((n_track, 3)),
        track_mask=jnp.zeros(n_track, bool),
        meas_cam=jnp.zeros(n_meas, jnp.int32),
        meas_track=jnp.zeros(n_meas, jnp.int32),
        meas_uv=jnp.zeros((n_meas, 2)),
        meas_mask=jnp.zeros(n_meas, bool),
    )
    prob = problem_from_sfm_data(data)
    return jax.jit(_optimize_jit, static_argnames=("opts",)).lower(prob, BAOptions())


def _lower_detector(image_batch: int, hw: tuple, max_keypoints: int):
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSift, DoGSiftOptions

    det = DoGSift(DoGSiftOptions(max_keypoints=max_keypoints))
    fn = jax.jit(jax.vmap(lambda im: det(im)))
    return fn.lower(jnp.zeros((image_batch,) + hw))


def prewarm_standard_shapes(
    pair_batches: Sequence[int] = (64,),
    max_keypoints: int = 1024,
    desc_dim: int = 128,
    hypotheses: int = 512,
    ba_shapes: Sequence[tuple] = ((64, 4096, 24576),),
    detector_hw: tuple = (480, 640),
    image_batch: int = 4,
) -> dict:
    """AOT-compile the standard shape set; returns {name: seconds}."""
    enable_persistent_cache()
    timings = {}

    def compile_one(name, lowered):
        t0 = time.perf_counter()
        lowered.compile()
        timings[name] = round(time.perf_counter() - t0, 2)
        logger.info("prewarmed %s in %.1fs", name, timings[name])

    for P in pair_batches:
        compile_one(
            f"two_view_P{P}_K{max_keypoints}",
            _lower_two_view(P, max_keypoints, desc_dim, hypotheses),
        )
    for (nc, nt, nm) in ba_shapes:
        compile_one(f"ba_{nc}c_{nt}t_{nm}m", _lower_ba(nc, nt, nm))
    compile_one(
        f"detector_B{image_batch}_{detector_hw[0]}x{detector_hw[1]}",
        _lower_detector(image_batch, detector_hw, max_keypoints),
    )
    return timings


def main():
    timings = prewarm_standard_shapes()
    total = sum(timings.values())
    logger.info("prewarm complete: %d programs, %.1fs total", len(timings), total)
    for k, v in timings.items():
        print(f"{k}: {v}s")


if __name__ == "__main__":
    main()
