"""Driver benchmark: the BASELINE.json metric set on the real chip.

Prints ONE JSON line. Primary metric (stable across rounds, comparable to
BENCH_r01): two-view front-end pair throughput. The "extra" dict carries
the rest of the BASELINE.json driver set — BA LM iterations/sec and the
Lund Door end-to-end wall-clock — plus a FLOPs model so pairs/s can be
read as achieved compute (MFU) rather than a bare rate.

Baselines (the reference is not runnable in this image — no gtsam — so
these are documented order-of-magnitude anchors, not measurements):
  - 20 pairs/s: reference GPU SuperPoint+LightGlue+USAC per-pair Dask task
    throughput (USAC + 2-view BA alone are 10-100 ms/pair).
  - 10 BA LM iters/s: GTSAM LM on a 64-camera / 4k-track problem (CPU,
    per-iteration sparse factorization ~100 ms).
  - 600 s Door wall-clock: reference CI door-12 benchmark job scale
    (ubuntu CPU, res 1296; /root/reference/.github/workflows/ci.yml:61).
"""

import json
import time

import numpy as np


def _two_view_bench():
    import jax
    import jax.numpy as jnp

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
    H = 512
    opts = TwoViewOptions(ransac=RansacOptions(num_hypotheses=H))
    key = jax.random.PRNGKey(0)

    # amortize the ~33 ms axon-tunnel round trip: run n_it batches inside
    # one on-device fori_loop (per-call host syncs would otherwise be
    # charged to the kernel)
    n_it = 10

    @jax.jit
    def run_many(b):
        def body(i, acc):
            res = run_two_view_batch(
                **b, key=jax.random.fold_in(key, i), opts=opts
            )
            return acc + jnp.sum(res.num_inliers)

        return jax.lax.fori_loop(0, n_it, body, jnp.int32(0))

    float(run_many(batch))  # compile
    t0 = time.perf_counter()
    float(run_many(batch))
    dt = (time.perf_counter() - t0) / n_it
    pairs_per_sec = P / dt

    # FLOPs model (per pair): mutual-NN score matmul 2*K^2*D; E-RANSAC
    # scoring H hypotheses x K points x ~60 flops (E apply + Sampson) x 2
    # passes (score + LO); GN polish ~ 10 iters x K x 200.
    K = n_pts
    flops_per_pair = 2 * K * K * D + 2 * H * K * 60 + 10 * K * 200
    tflops = pairs_per_sec * flops_per_pair / 1e12
    # v5e peak: 197 TFLOP/s bf16 (f32 path ~1/4 of that); MFU vs bf16 peak.
    mfu_pct = 100.0 * tflops / 197.0
    return pairs_per_sec, tflops, mfu_pct


def _ba_bench():
    """LM iterations/sec on a realistic synthetic problem (64 cams, 4096
    tracks, ~24k measurements), dense-Schur layout (exact camera solve
    per LM step, analytic entry-major linearization)."""
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.bundle.ba import BAOptions, _optimize_jit, problem_from_sfm_data
    from gtsfm_tpu.common.sfm_data import SfmData
    from gtsfm_tpu.geometry import Cal3Bundler, SE3
    from gtsfm_tpu.geometry.so3 import expmap

    rng = np.random.default_rng(1)
    n_cam, n_track, obs_per_track = 64, 4096, 6
    pts = rng.uniform(-2, 2, (n_track, 3)).astype(np.float32)
    ang = np.linspace(0, 2 * np.pi, n_cam, endpoint=False)
    centers = np.stack([8 * np.cos(ang), 8 * np.sin(ang), np.zeros(n_cam)], 1).astype(np.float32)
    Rws, ts = [], []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z], 1).T  # world->cam
        Rws.append(R)
        ts.append(-R @ c)
    Rws, ts = np.stack(Rws), np.stack(ts)

    m_cam = rng.integers(0, n_cam, (n_track, obs_per_track))
    meas_cam = m_cam.reshape(-1).astype(np.int32)
    meas_track = np.repeat(np.arange(n_track, dtype=np.int32), obs_per_track)
    pc = np.einsum("mij,mj->mi", Rws[meas_cam], pts[meas_track]) + ts[meas_cam]
    uv = 500.0 * pc[:, :2] / np.maximum(pc[:, 2:3], 0.1) + 400.0
    uv += rng.normal(0, 1.0, uv.shape)
    M = meas_cam.shape[0]

    cal = Cal3Bundler.create(
        jnp.full(n_cam, 500.0), jnp.zeros(n_cam), jnp.zeros(n_cam),
        jnp.full(n_cam, 400.0), jnp.full(n_cam, 400.0),
    )
    # SfmData poses are camera-to-world (SE3 == wTi): invert the
    # world-to-camera (Rws, ts) used to synthesize the measurements
    noise_rot = expmap(jnp.asarray(rng.normal(0, 0.02, (n_cam, 3)), jnp.float32))
    poses = SE3(
        R=jnp.einsum("nij,nkj->nik", noise_rot, jnp.asarray(Rws)),
        t=jnp.asarray(centers + rng.normal(0, 0.05, centers.shape), jnp.float32),
    )
    data = SfmData(
        poses=poses,
        pose_mask=jnp.ones(n_cam, bool),
        cal=cal,
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape), jnp.float32),
        track_mask=jnp.ones(n_track, bool),
        meas_cam=jnp.asarray(meas_cam),
        meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(uv, jnp.float32),
        meas_mask=jnp.ones(M, bool),
    )
    prob = problem_from_sfm_data(data, fixed_cam=jnp.arange(n_cam) == 0)
    from gtsfm_tpu.bundle.ba import densify_problem

    prob, L = densify_problem(prob)
    opts = BAOptions(max_iterations=30, layout="dense", dense_track_len=L)

    _, c0, cf, _ = _optimize_jit(prob, opts)  # compile + correctness check
    assert float(cf) < float(c0), "BA bench did not reduce cost"

    # amortized on-device timing (see _two_view_bench: per-call syncs
    # would charge the axon tunnel round trip to the solver)
    n_runs = 4

    @jax.jit
    def run_many(p):
        def body(i, acc):
            pr = p.replace(points=p.points + 1e-7 * i)  # defeat loop hoisting
            _, _c0, _cf, _ = _optimize_jit(pr, opts)
            return acc + _cf

        return jax.lax.fori_loop(0, n_runs, body, jnp.float32(0.0))

    float(run_many(prob))  # compile
    t0 = time.perf_counter()
    float(run_many(prob))
    dt = (time.perf_counter() - t0) / n_runs
    return opts.max_iterations / dt, M


def _ba_scale_bench():
    """LM iterations/sec on the skydio-501 merge-BA regime: 512 cameras,
    100k tracks, ~600k measurements, scatter (mesh-shardable) layout —
    the problem size the reference runs on its self-hosted benchmark
    (/root/reference/.github/workflows/benchmark-self-hosted.yml:20-31)."""
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.bundle.ba import BAOptions, _optimize_jit, problem_from_sfm_data
    from gtsfm_tpu.common.sfm_data import SfmData
    from gtsfm_tpu.geometry import Cal3Bundler, SE3
    from gtsfm_tpu.geometry.so3 import expmap

    rng = np.random.default_rng(2)
    n_cam, n_track, obs_per_track = 512, 100_000, 6
    pts = rng.uniform(-10, 10, (n_track, 3)).astype(np.float32)
    ang = np.linspace(0, 4 * np.pi, n_cam, endpoint=False)
    centers = np.stack(
        [30 * np.cos(ang), 30 * np.sin(ang), np.linspace(0, 10, n_cam)], 1
    ).astype(np.float32)
    Rws, ts = [], []
    for c in centers:
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z], 1).T
        Rws.append(R)
        ts.append(-R @ c)
    Rws, ts = np.stack(Rws), np.stack(ts)

    m_cam = rng.integers(0, n_cam, (n_track, obs_per_track))
    meas_cam = m_cam.reshape(-1).astype(np.int32)
    meas_track = np.repeat(np.arange(n_track, dtype=np.int32), obs_per_track)
    pc = np.einsum("mij,mj->mi", Rws[meas_cam], pts[meas_track]) + ts[meas_cam]
    uv = 500.0 * pc[:, :2] / np.maximum(pc[:, 2:3], 0.5) + 400.0
    uv += rng.normal(0, 1.0, uv.shape)
    M = meas_cam.shape[0]

    cal = Cal3Bundler.create(
        jnp.full(n_cam, 500.0), jnp.zeros(n_cam), jnp.zeros(n_cam),
        jnp.full(n_cam, 400.0), jnp.full(n_cam, 400.0),
    )
    noise_rot = expmap(jnp.asarray(rng.normal(0, 0.01, (n_cam, 3)), jnp.float32))
    poses = SE3(
        R=jnp.einsum("nij,nkj->nik", noise_rot, jnp.asarray(Rws)),
        t=jnp.asarray(centers + rng.normal(0, 0.05, centers.shape), jnp.float32),
    )
    data = SfmData(
        poses=poses,
        pose_mask=jnp.ones(n_cam, bool),
        cal=cal,
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape), jnp.float32),
        track_mask=jnp.ones(n_track, bool),
        meas_cam=jnp.asarray(meas_cam),
        meas_track=jnp.asarray(meas_track),
        meas_uv=jnp.asarray(uv, jnp.float32),
        meas_mask=jnp.ones(M, bool),
    )
    prob = problem_from_sfm_data(data, fixed_cam=jnp.arange(n_cam) == 0)
    # entry = the single-chip big-N layout (measured 2.6x the scatter
    # segment-sum formulation at this size; scatter exists for meshes)
    opts = BAOptions(max_iterations=20, cg_iterations=15, layout="entry")

    _, c0, cf, _ = _optimize_jit(prob, opts)  # compile
    float(cf)
    t0 = time.perf_counter()
    _, c0, cf, _ = _optimize_jit(prob, opts)
    float(cf)
    dt = time.perf_counter() - t0
    assert float(cf) < float(c0), "scale BA did not reduce cost"
    return opts.max_iterations / dt, M


def _door_bench():
    """Lund Door end-to-end via the production SceneOptimizer (DoG-SIFT
    weight-free front-end, res 480 — the integration-test config, which
    holds rot<2deg / trans<1.0 gates).

    Returns (cold_sec, warm_sec, parity) where cold includes all XLA
    compilation of the run and warm is a second full pipeline execution
    replaying the compile cache — the TPU production number (VERDICT r2
    #4: a TPU-native framework reports a warm number). parity carries the
    measured accuracy metrics against the MOUNTED reference-produced
    reconstruction colmap_ground_truth/ (VERDICT r2 #1)."""
    import os
    import tempfile

    door = "/root/reference/tests/data/set1_lund_door"
    if not os.path.isdir(door):
        return None, None, {}
    from gtsfm_tpu.evaluation.compare import compare_reconstructions
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSiftOptions
    from gtsfm_tpu.io import colmap as colmap_io
    from gtsfm_tpu.loader.olsson import OlssonLoader
    from gtsfm_tpu.retriever.retrievers import ExhaustiveRetriever
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions

    def run_once(tmp):
        loader = OlssonLoader(door, max_resolution=480)
        so = SceneOptimizer(
            SceneOptimizerOptions(
                detector=DoGSiftOptions(max_keypoints=1200, contrast_threshold=0.008),
                output_root=tmp,
            ),
            retriever=ExhaustiveRetriever(),
        )
        t0 = time.perf_counter()
        data, _groups = so.run(loader)
        dt = time.perf_counter() - t0
        assert int(data.number_tracks()) > 300
        return data, loader, dt

    with tempfile.TemporaryDirectory() as tmp:
        data, loader, cold = run_once(tmp)
    with tempfile.TemporaryDirectory() as tmp:
        data, loader, warm = run_once(tmp)

    parity = {}
    gt_dir = os.path.join(door, "colmap_ground_truth")
    if os.path.isdir(gt_dir):
        ref = colmap_io.read_scene(gt_dir)
        g = compare_reconstructions(data, ref)
        scal = {m.name: m.scalar for m in g.metrics if m.dist is None}
        parity["door_auc5_vs_reference"] = round(scal.get("pose_auc_@5.0_deg", 0.0), 4)
        # north star: both reconstructions vs the dataset GT poses
        gt_poses = loader.get_gt_poses()

        # parity MUST be computed against aligned camera sets: a silently
        # spliced GT (round-4 fit()) would shift every pose if a camera
        # were ever dropped. Door is a 12-camera scene with full masks in
        # both reconstructions — assert that instead of papering over it.
        n_gt = gt_poses.t.shape[0]
        assert data.poses.t.shape[0] == n_gt, (
            f"ours has {data.poses.t.shape[0]} cameras, GT has {n_gt}"
        )
        assert ref.poses.t.shape[0] == n_gt, (
            f"reference recon has {ref.poses.t.shape[0]} cameras, GT has {n_gt}"
        )
        ours = compare_reconstructions(data, data.replace(poses=gt_poses))
        refg = compare_reconstructions(ref, ref.replace(poses=gt_poses))
        our5 = {m.name: m.scalar for m in ours.metrics if m.dist is None}[
            "pose_auc_@5.0_deg"
        ]
        ref5 = {m.name: m.scalar for m in refg.metrics if m.dist is None}[
            "pose_auc_@5.0_deg"
        ]
        parity["door_auc5_vs_gt"] = round(our5, 4)
        parity["door_auc5_reference_vs_gt"] = round(ref5, 4)
        parity["door_auc5_north_star_ratio"] = round(our5 / max(ref5, 1e-9), 4)
    return cold, warm, parity


def _deep_matcher_bench():
    """On-device LightGlue throughput at K=1024 (the BASELINE.md deep
    front-end metric: SuperPoint+LightGlue pair matching). Timed with a
    fori_loop iterating the full 9-layer forward + assignment on-device —
    per-call host transfers would otherwise dominate over the axon tunnel
    and understate device throughput ~100x."""
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.frontend.matchers.lightglue import LightGlueNet, LightGlueOptions

    rng = np.random.default_rng(0)
    net = LightGlueNet(LightGlueOptions())
    K, P, REP = 1024, 8, 50
    d0 = jnp.asarray(rng.normal(size=(K, 256)).astype(np.float32))
    c0 = jnp.asarray(rng.uniform(-1, 1, (K, 2)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), d0, d0, c0, c0)
    d0b = jnp.asarray(rng.normal(size=(P, K, 256)).astype(np.float32))
    c0b = jnp.asarray(rng.uniform(-1, 1, (P, K, 2)).astype(np.float32))
    vnet = jax.vmap(lambda a, b, c, d: net.apply(params, a, b, c, d))

    @jax.jit
    def run(x):
        def body(i, acc):
            z, _, _ = vnet(x + 1e-9 * acc, d0b, c0b, c0b)
            return acc + jnp.sum(z[:, -1, :])
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0.0))

    float(run(d0b))  # compile
    t0 = time.perf_counter()
    float(run(d0b))
    dt = (time.perf_counter() - t0) / REP
    # ~105 GFLOP per pair forward (9 layers, K=1024, d=256, 4 heads)
    return P / dt, 105e9 * P / dt / 1e12


def _splat_bench():
    """Tile-binned gaussian rasterizer: DEVICE ms/frame at 100k gaussians,
    540x960 (the gsplat-class headline). Timed with a fori_loop rendering
    REP frames on-device — per-call host syncs would otherwise add the
    ~33 ms axon-tunnel round trip to every frame."""
    import jax
    import jax.numpy as jnp

    from gtsfm_tpu.geometry import SE3
    from gtsfm_tpu.splat.gs_data import GSData
    from gtsfm_tpu.splat.rendering import _render_tiled_impl

    rng = np.random.default_rng(0)
    G, H, W = 100_000, 540, 960
    means = rng.uniform(-4, 4, (G, 3)).astype(np.float32)
    means[:, 2] += 10
    gs = GSData(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.005, 0.03, (G, 3))).astype(np.float32)
        ),
        quats=jnp.asarray(np.tile([1, 0, 0, 0.0], (G, 1)).astype(np.float32)),
        colors=jnp.asarray(rng.normal(0, 1, (G, 3)).astype(np.float32)),
        opacity_logit=jnp.asarray(rng.normal(0, 1, G).astype(np.float32)),
        alive=jnp.ones(G, jnp.float32),
    )
    wTc = SE3.identity(())
    K = jnp.asarray([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]])
    # depth-quantization bits (matches the render_tiled wrapper's choice:
    # the tile grid takes the high bits, depth the rest)
    n_tiles = -(-H // 16) * -(-W // 16)
    rank_bits = 31 - max(1, (n_tiles + 2).bit_length())
    REP = 20

    @jax.jit
    def run_many(gs0):
        def body(i, acc):
            g = gs0.replace(opacity_logit=gs0.opacity_logit + 1e-6 * i + 1e-9 * acc)
            img, _ = _render_tiled_impl(g, wTc, K, H, W, rank_bits=rank_bits)
            return acc + jnp.sum(img)

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0.0))

    float(run_many(gs))  # compile
    t0 = time.perf_counter()
    float(run_many(gs))
    return (time.perf_counter() - t0) / REP * 1e3


def _load_palace_structure(palace: str):
    """Real palace-fine-arts-281 graph structure: verified visibility edges
    (4139 pairs / 281 cams) + the reference's saved NetVLAD similarity
    matrix. The fixture ships no images, so these two files ARE the real
    data (the COLMAP dirs beside them are a sample payload)."""
    import csv
    import os

    edges = set()
    with open(os.path.join(palace, "visibility_graph.csv")) as f:
        for row in csv.DictReader(f):
            i, j = int(row["i"]), int(row["j"])
            edges.add((min(i, j), max(i, j)))
    edges = np.array(sorted(edges), np.int32)
    rows = []
    with open(os.path.join(palace, "netvlad_similarity_matrix.txt")) as f:
        for line in f:
            line = line.strip().rstrip(",")
            if line:
                rows.append([float(x) for x in line.split(",")])
    sim = np.array(rows, np.float32)
    sim = np.where(np.isfinite(sim), sim, -1.0)
    sim = np.maximum(sim, sim.T)
    return edges, sim


def _palace_bench():
    """Reference-benchmark-scale end-to-end: palace-fine-arts-281, the
    largest scene in the reference's CI matrix this image mounts
    (/root/reference/.github/workflows/ci.yml:70 runs it at res 320).

    The mounted fixture carries the REAL 281-camera / 4139-edge verified
    visibility graph and the REAL NetVLAD similarity matrix but no images,
    so GT geometry is synthesized conditioned on the real graph (Fiedler-
    ordered camera ring; loader/synthetic.py) and correspondences are
    projected along the real edges — the reference's own synthetic-front-end
    validation strategy (synthetic_correspondence_generator.py:36) at its CI
    benchmark scale. The timed section is the PRODUCTION SceneOptimizer:
    two-view estimation over all 4139 pairs -> METIS partition ->
    per-cluster MVO -> hierarchical Sim3 merge -> final poses, on-device.
    """
    import os

    palace = "/root/reference/tests/data/palace"
    if not os.path.isdir(palace):
        return {}
    import jax.numpy as jnp

    from gtsfm_tpu.evaluation.metrics import pose_auc
    from gtsfm_tpu.frontend.synthetic import (
        SyntheticCorrespondenceGenerator,
        SyntheticOptions,
    )
    from gtsfm_tpu.geometry import Cal3Bundler, so3
    from gtsfm_tpu.geometry.sim3 import align_poses_sim3
    from gtsfm_tpu.loader.synthetic import SyntheticSceneLoader, spectral_ring_poses
    from gtsfm_tpu.retriever.retrievers import pairs_from_similarity_matrix
    from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions

    edges, sim = _load_palace_structure(palace)
    n = int(edges.max()) + 1

    # retrieval fidelity on the real similarity matrix: how much of the
    # reference's verified graph does our top-K similarity retrieval recover
    retr = pairs_from_similarity_matrix(sim, num_matched=15, min_score=0.3)
    edge_set = {tuple(e) for e in edges.tolist()}
    retr_set = {tuple(e) for e in retr.tolist()}
    recall = len(edge_set & retr_set) / max(len(edge_set), 1)

    poses = spectral_ring_poses(edges, n)
    h, w = 240, 320  # the reference CI resolution for this scene
    cal = Cal3Bundler.create(
        jnp.full(n, 300.0), jnp.zeros(n), jnp.zeros(n),
        jnp.full(n, w / 2.0), jnp.full(n, h / 2.0),
    )
    loader = SyntheticSceneLoader(poses, cal=cal, image_size=(h, w))

    class _FixedPairs:
        def get_image_pairs(self, num_images, global_descriptors=None, loader=None):
            return edges

    so = SceneOptimizer(
        SceneOptimizerOptions(
            hierarchical=True,
            max_cluster_size=40,
            save_colmap=False,
            reconnect_bridges=False,
        ),
        retriever=_FixedPairs(),
        correspondence=SyntheticCorrespondenceGenerator(
            SyntheticOptions(num_points=800, noise_px=0.4, seed=0)
        ),
    )
    t0 = time.perf_counter()
    data, groups = so.run(loader)
    wall = time.perf_counter() - t0
    stage_sec = {}
    for g in groups:
        for m in g.metrics:
            if m.dist is None and (m.name.endswith("_sec") or m.name.endswith("_secs")):
                stage_sec[m.name] = round(float(m.scalar), 1)

    est_mask = np.asarray(data.pose_mask)
    sim3 = align_poses_sim3(data.poses, poses, mask=jnp.asarray(est_mask))
    aligned = sim3.transform_pose(data.poses)
    r_err = np.asarray(so3.relative_angle_deg(aligned.R, poses.R))[est_mask]
    t_err = np.linalg.norm(
        np.asarray(aligned.t) - np.asarray(poses.t), axis=-1
    )[est_mask]
    auc = pose_auc(r_err)
    return {
        "palace281_wall_sec": round(wall, 1),
        "palace281_images": n,
        "palace281_pairs": int(len(edges)),
        "palace281_registered": int(est_mask.sum()),
        "palace281_med_rot_err_deg": round(float(np.median(r_err)), 3),
        "palace281_med_trans_err": round(float(np.median(t_err)), 3),
        "palace281_rot_auc5": round(auc["pose_auc_@5.0_deg"], 4),
        "palace281_retrieval_recall_top15": round(recall, 3),
        "palace281_stage_sec": stage_sec,
    }


def _probe_backend(timeout_s: float = 240.0):
    """Check the default jax backend initializes AND dispatches, in a
    SUBPROCESS (an in-process wedged-TPU init hangs uninterruptibly — the
    round-3 failure mode). Returns (ok, note)."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "print(jax.devices()[0].platform, float((x @ x).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s, capture_output=True
        )
        if r.returncode == 0:
            return True, r.stdout.decode().strip()
        return False, (r.stderr or b"").decode()[-400:]
    except subprocess.TimeoutExpired:
        return False, f"backend probe hung > {timeout_s:.0f}s (wedged TPU init)"


class _MetricTimeout(Exception):
    pass


def _run_metric(name, fn, timeout_s, errors):
    """Run one benchmark bounded by SIGALRM; never let one metric kill the
    round's evidence. Returns fn() or None (with errors[name] set).
    Progress goes to stderr so stdout stays the single driver JSON line."""
    import signal
    import sys

    def _raise(signum, frame):
        raise _MetricTimeout(f"{name} exceeded {timeout_s}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(int(timeout_s))
    t0 = time.perf_counter()
    try:
        from gtsfm_tpu.utils.tracing import device_trace

        with device_trace(name):
            out = fn()
        print(f"[bench] {name} done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        return out
    except BaseException as e:  # noqa: BLE001 — evidence must survive anything
        errors[name] = f"{type(e).__name__}: {e}"[:300]
        print(
            f"[bench] {name} FAILED after {time.perf_counter() - t0:.1f}s: "
            f"{errors[name]}", file=sys.stderr,
        )
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    import os
    import signal
    import sys

    errors = {}
    state = {}  # incrementally-filled metric results; dumpable at ANY point

    def rnd(x, n=2):
        return None if x is None else round(x, n)

    baseline_pairs, baseline_ba, baseline_door = 20.0, 10.0, 600.0
    # ba_scale anchor: GTSAM LM at the skydio-501 merge-BA size (512 cams /
    # 600k meas). Per-iteration cost = relinearize 600k GeneralSFMFactor2
    # (~25x the ~100 ms measured at 24k meas) + sparse Schur factorization
    # of the 4608-dim camera system (~4608^3/3 = 3e10 flops at a few
    # GFLOP/s sparse-CPU) => ~2.5 s/iter, i.e. ~0.4 LM it/s. Documented
    # anchor, not a measurement (gtsam not runnable in this image); same
    # status as the other anchors above (bundle_adjustment.py:347-410).
    baseline_ba_scale = 0.4

    def build_json():
        pairs_per_sec, tflops, mfu_pct = state.get("two_view") or (None, None, None)
        lg_pairs_per_sec, lg_tflops = state.get("lightglue") or (None, None)
        ba_iters_per_sec, ba_meas = state.get("ba") or (None, "n/a")
        ba_scale_iters_per_sec, ba_scale_meas = state.get("ba_scale") or (None, "n/a")
        door_cold, door_warm, parity = state.get("door") or (None, None, {})
        splat_ms = state.get("splat")
        palace = state.get("palace_e2e")
        return {
            "metric": "two_view_pairs_per_sec",
            "value": rnd(pairs_per_sec, 1),
            "unit": "pairs/s (1024kp, 512-hyp E-RANSAC + GN polish)",
            "vs_baseline": rnd(None if pairs_per_sec is None else pairs_per_sec / baseline_pairs),
            "extra": {
                "platform": state.get("platform"),
                "two_view_tflops_per_sec": rnd(tflops, 3),
                "two_view_mfu_pct_of_bf16_peak": rnd(mfu_pct, 3),
                "lightglue_pairs_per_sec": rnd(lg_pairs_per_sec, 1),
                "lightglue_tflops_per_sec": rnd(lg_tflops),
                "ba_lm_iters_per_sec": rnd(ba_iters_per_sec),
                "ba_problem": f"64 cams, 4096 tracks, {ba_meas} meas, dense-Schur exact/LM",
                "ba_vs_baseline": rnd(None if ba_iters_per_sec is None else ba_iters_per_sec / baseline_ba),
                "ba_scale_lm_iters_per_sec": rnd(ba_scale_iters_per_sec),
                "ba_scale_problem": f"512 cams, 100k tracks, {ba_scale_meas} meas, entry/LM+PCG",
                "ba_scale_vs_baseline": rnd(
                    None if ba_scale_iters_per_sec is None
                    else ba_scale_iters_per_sec / baseline_ba_scale
                ),
                "splat_tiled_ms_per_frame_100k": rnd(splat_ms, 1),
                "door_e2e_cold_sec": rnd(door_cold, 1),
                "door_e2e_warm_sec": rnd(door_warm, 1),
                "door_vs_baseline": rnd(None if door_warm is None else baseline_door / door_warm),
                **parity,
                **(palace or {}),
                "errors": errors,
                "baselines": "documented anchors, reference not runnable here (see module docstring)",
            },
        }

    dumped = {"done": False}

    def dump(partial=False):
        out = build_json()
        if partial:
            out["extra"]["partial"] = True
        dumped["done"] = True
        print(json.dumps(out))
        sys.stdout.flush()

    def save_sidecar():
        """Persist current evidence to a file that survives even SIGKILL
        (a Python signal handler can't fire while the main thread is
        blocked inside a native XLA dispatch — ADVICE r4). Written after
        every completed metric."""
        try:
            side = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_PARTIAL.json")
            out = build_json()
            out["extra"]["partial"] = True
            with open(side + ".tmp", "w") as f:
                f.write(json.dumps(out) + "\n")
            os.replace(side + ".tmp", side)
        except OSError:
            pass

    # If the DRIVER's own timeout kills us (SIGTERM from `timeout`, or ^C),
    # emit whatever evidence we already have before dying — a partial JSON
    # line beats an rc=124 with nothing parseable (round-3 postmortem).
    # Guard against a second signal arriving during/after the final dump:
    # a second JSON line would violate the single-line driver contract.
    def _dump_and_exit(signum, frame):
        if not dumped["done"]:
            errors["killed"] = f"received signal {signum}; partial results emitted"
            dump(partial=True)
        os._exit(128 + signum)  # 143=SIGTERM (driver kill), 130=SIGINT (manual)

    signal.signal(signal.SIGTERM, _dump_and_exit)
    signal.signal(signal.SIGINT, _dump_and_exit)

    # Global wall budget: never outlive the driver's patience (observed
    # driver kill ~1800 s in round 4 — default safely inside that). Per-
    # metric timeouts are clamped to the remaining budget; metrics that no
    # longer fit are skipped with an error note instead of risking a kill.
    try:
        budget_s = float(os.environ.get("BENCH_BUDGET_S", 1650))
    except ValueError:
        errors["budget"] = (
            f"malformed BENCH_BUDGET_S={os.environ.get('BENCH_BUDGET_S')!r}; "
            "using 1650"
        )
        budget_s = 1650.0
    t_start = time.perf_counter()

    def remaining():
        return budget_s - (time.perf_counter() - t_start)

    # ---- backend health gate (round-3 postmortem: a wedged axon TPU hung
    # the first dispatch; probe in a subprocess, retry once, fall back to
    # CPU so the driver ALWAYS gets a JSON line) -------------------------
    ok, note = _probe_backend()
    if not ok:
        ok2, note2 = _probe_backend(timeout_s=120.0)
        if not ok2:
            errors["backend"] = (
                f"default backend unhealthy ({note}; retry: {note2}); "
                "fell back to JAX_PLATFORMS=cpu"
            )
            os.environ["JAX_PLATFORMS"] = "cpu"

    from gtsfm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if "backend" in errors:
        # The env var alone is NOT enough: the axon plugin's sitecustomize
        # re-forces jax_platforms="axon,cpu" via jax.config at import time,
        # so a wedged TPU would still be initialized (and hang) at the
        # first jax.devices() below. Override it back at the config level.
        jax.config.update("jax_platforms", "cpu")
    state["platform"] = jax.devices()[0].platform

    # Order = least-replaceable evidence first (VERDICT r4 #2): the Door
    # parity number and the reference-scale Palace e2e must land even if a
    # later metric eats the budget; the synthetic micro-benches come after.
    metrics = [
        ("two_view", _two_view_bench, 600),
        ("door", _door_bench, 900),
        ("palace_e2e", _palace_bench, 900),
        ("ba", _ba_bench, 400),
        ("lightglue", _deep_matcher_bench, 400),
        ("splat", _splat_bench, 400),
        ("ba_scale", _ba_scale_bench, 500),
    ]
    for name, fn, cap in metrics:
        left = remaining() - 30.0  # reserve for JSON emission
        if left < 60.0:
            errors[name] = f"skipped: global budget exhausted ({budget_s:.0f}s)"
            print(f"[bench] {name} SKIPPED (budget)", file=sys.stderr)
            continue
        state[name] = _run_metric(name, fn, min(cap, left), errors)
        save_sidecar()

    dump()


if __name__ == "__main__":
    main()
