"""Driver benchmark: two-view front-end throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: image pairs/sec through the full batched two-view stage (mutual-NN
matching over 1024 keypoints x 128-d descriptors, 512-hypothesis essential
RANSAC with LO + GN polish, inlier support) — the dominant axis of the
reference pipeline (BASELINE.md north-star: front-end pair throughput).
vs_baseline normalizes against 20 pairs/s, a generous estimate of the
reference's GPU SuperPoint+LightGlue+USAC per-pair task throughput
(reference runs one Dask task per pair; USAC+2-view BA alone are
10-100 ms/pair on CPU).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from gtsfm_tpu.frontend.two_view import TwoViewOptions, run_two_view_batch
    from gtsfm_tpu.frontend.verifiers.essential import RansacOptions
    from gtsfm_tpu.geometry import Cal3Bundler

    rng = np.random.default_rng(0)
    n_cams, n_pts, D = 8, 1024, 128
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    pdesc = rng.normal(size=(n_pts, D)).astype(np.float32)
    pdesc /= np.linalg.norm(pdesc, axis=-1, keepdims=True)
    ang = np.linspace(0, 1.5 * np.pi, n_cams)
    centers = np.stack([4 * np.cos(ang), 4 * np.sin(ang), np.zeros(n_cams)], 1).astype(np.float32)
    Rs = []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        Rs.append(np.stack([x, np.cross(z, x), z], 1))
    Rs = np.stack(Rs).astype(np.float32)
    kp = np.zeros((n_cams, n_pts, 2), np.float32)
    msk = np.zeros((n_cams, n_pts), bool)
    dsc = np.zeros((n_cams, n_pts, D), np.float32)
    for i in range(n_cams):
        pc = (pts - centers[i]) @ Rs[i]
        uv = 500.0 * pc[:, :2] / pc[:, 2:3] + np.array([320, 240], np.float32)
        perm = rng.permutation(n_pts)
        kp[i] = uv[perm]
        msk[i] = pc[perm, 2] > 0
        d = pdesc[perm] + 0.05 * rng.normal(size=(n_pts, D)).astype(np.float32)
        dsc[i] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    base_pairs = np.array([(i, j) for i in range(n_cams) for j in range(i + 1, n_cams)], np.int32)
    P = 128
    pairs = np.tile(base_pairs, (P // len(base_pairs) + 1, 1))[:P]
    cal = Cal3Bundler.create(
        jnp.full(P, 500.0), jnp.zeros(P), jnp.zeros(P), jnp.full(P, 320.0), jnp.full(P, 240.0)
    )
    batch = dict(
        kp_xy1=jnp.asarray(kp[pairs[:, 0]]),
        kp_xy2=jnp.asarray(kp[pairs[:, 1]]),
        desc1=jnp.asarray(dsc[pairs[:, 0]]),
        desc2=jnp.asarray(dsc[pairs[:, 1]]),
        kp_mask1=jnp.asarray(msk[pairs[:, 0]]),
        kp_mask2=jnp.asarray(msk[pairs[:, 1]]),
        cal1=cal,
        cal2=cal,
        pair_mask=jnp.ones(P, bool),
    )
    opts = TwoViewOptions(ransac=RansacOptions(num_hypotheses=512))
    key = jax.random.PRNGKey(0)

    # compile
    res = run_two_view_batch(**batch, key=key, opts=opts)
    float(jnp.sum(res.num_inliers))

    n_it = 10
    t0 = time.perf_counter()
    for i in range(n_it):
        res = run_two_view_batch(**batch, key=jax.random.fold_in(key, i), opts=opts)
        float(jnp.sum(res.num_inliers))
    dt = (time.perf_counter() - t0) / n_it
    pairs_per_sec = P / dt

    baseline_pairs_per_sec = 20.0
    print(
        json.dumps(
            {
                "metric": "two_view_pairs_per_sec",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s (1024kp, 512-hyp E-RANSAC + GN polish)",
                "vs_baseline": round(pairs_per_sec / baseline_pairs_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
