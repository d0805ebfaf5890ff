"""Essential-matrix estimation: vmapped fixed-iteration 8-point RANSAC
with locally-optimized refits and cheirality-based pose recovery.

Parity: /root/reference/gtsfm/frontend/verifier/ransac.py (OpenCV USAC
5-point essential RANSAC, 0.999999 success prob, 1e6 max iters) and
/root/reference/gtsfm/utils/verification.py (E -> relative pose recovery).

TPU-first re-design: data-dependent early-exit RANSAC becomes a static
H-hypothesis batch (all hypotheses scored in parallel via one vmap; masked
argmax replaces early exit), followed by fixed LO refit rounds on the
running inlier set. The 8-point solve is an eigh of a 9x9 normal matrix —
batched tiny eigendecompositions, ideal vmap fodder. The 5-point minimal
solver (Nister) can slot in behind the same interface later; with H large
the 8-point sampler matches USAC quality on SfM-scale inlier ratios.

Conventions (match the reference):
  correspondence k: uv1[k] in image i1, uv2[k] in image i2
  E satisfies  x2^T E x1 = 0  for normalized homogeneous x
  recovered pose is i2Ti1 = (i2Ri1, i2Ui1): x2 = R x1 + t (unit-norm t)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsfm_tpu.geometry import SE3, so3
from gtsfm_tpu.utils.numerics import (
    einsum as p_einsum,
    mm,
    nullvec_pinned,
    nullvec_pinned_from_rows,
    nullvec_pinned_scalarized,
)


class RansacOptions(NamedTuple):
    num_hypotheses: int = 512
    lo_rounds: int = 3  # local-optimization refits on the inlier set
    min_inliers: int = 8
    polish_iterations: int = 8  # final GN polish on the essential manifold
    polish_huber: float = 2.0
    # "msac" = truncated-residual gain, sum(max(thresh2 - err, 0)) — the
    # USAC/MAGSAC-family default. Plain inlier COUNT saturates on
    # low-parallax pairs (measured on Door: every correspondence is an
    # inlier of both the true model and a rotation-translation-confused one
    # 120deg off; count ties, MSAC separates them by residual mass).
    # "inliers" = count voting; "lmeds" = least-median-of-squares (parity:
    # the reference's LMEDS verifier).
    scoring: str = "msac"
    # preemptive scoring: rank hypotheses on a fixed subset of
    # correspondences (0 = use all); LO/final verification always use all
    score_subset: int = 256


def _normal_matrix(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Row-normalized 8-point normal matrix A^T A (9, 9)."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)  # (K, 3)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    # A row: kron ordered so that A @ vec(E) = sum E_ij p2_i p1_j
    A = (p2[:, :, None] * p1[:, None, :]).reshape(-1, 9)  # (K, 9)
    # row normalization: conditions the spectrum for the power solver
    nrm = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(nrm, 1e-12)
    Aw = A * w[:, None]
    return p_einsum("ki,kj->ij", Aw, A)


def _project_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project onto the essential manifold: singular values (1, 1, 0)."""
    U, _, Vt = jnp.linalg.svd(E)
    S = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return mm(U * S[None, :], Vt)


def _eight_point_fast(x1, x2, w) -> jnp.ndarray:
    """Hypothesis-grade 8-point: pinned-coordinate nullvector solve, NO
    manifold projection (Sampson scoring tolerates both; LO refits are
    exact eigh + projection)."""
    AtA = _normal_matrix(x1, x2, w)
    e = nullvec_pinned(AtA)
    return e.reshape(3, 3)


def _eight_point(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Exact weighted 8-point with essential-manifold projection (used for
    LO refits and finals — small batches where eigh cost is fine)."""
    AtA = _normal_matrix(x1, x2, w)
    _, vecs = jnp.linalg.eigh(AtA)
    return _project_essential(vecs[:, 0].reshape(3, 3))


def _sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error in normalized units, (K,).

    Scale-normalizes E first (Sampson is scale-invariant) and returns a
    huge error for degenerate geometry: with E ~ 0 both numerator and
    denominator vanish and the raw ratio reads 0 — a zero hypothesis from
    a failed minimal solve would otherwise score as a PERFECT model under
    every scoring rule (measured: a zero E acing MSAC with all points at
    "error 0" and poisoning pose recovery downstream)."""
    E = E / jnp.maximum(jnp.linalg.norm(E), 1e-20)
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = p_einsum("ij,kj->ki", E, p1)  # (K, 3)
    Etx2 = p_einsum("ji,kj->ki", E, p2)
    num = jnp.sum(p2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    # den ~ 0 with unit-norm E means the point sits on both epipoles /
    # the model is degenerate for it — that is "no constraint", not "fits"
    return jnp.where(den > 1e-9, num / jnp.maximum(den, 1e-12), 1e9)


def essential_information_spectrum(x1, x2, w, R, t):
    """Eigenvalue range (min, max) of the 5-dof relative-pose GN information.

    The TPU-native equivalent of the reference's two-view indeterminate-
    linear-system check (bundle_adjustment.py:566-579: gtsam.Marginals
    throws on a singular 2-view BA system and the pair is discarded).
    Here the relative pose lives on the essential manifold, so the signal
    is the spectrum of H = J^T W J for the Sampson residual w.r.t. the
    5-dof tangent (3 rotation + 2 translation-direction): a near-zero
    minimum eigenvalue relative to the maximum means the matched points do
    not determine the pose (degenerate geometry). Vmappable; (min, max).
    """

    def basis(t_):
        a = jnp.where(
            jnp.abs(t_[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
        )
        b1 = jnp.cross(t_, a)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
        b2 = jnp.cross(t_, b1)
        return jnp.stack([b1, b2], axis=-1)

    def residual(params):
        Rn = mm(R, so3.expmap(params[:3]))
        tn = t + p_einsum("ij,j->i", basis(t), params[3:])
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        E = mm(so3.hat(tn), Rn)
        return jnp.sqrt(jnp.maximum(_sampson_error(E, x1, x2), 1e-18))

    J = jax.jacfwd(residual)(jnp.zeros(5))  # (K, 5)
    H = p_einsum("ki,kj->ij", J * w[:, None], J)
    eigs = jnp.linalg.eigvalsh(H)
    return eigs[0], eigs[-1]


def _triangulate_midpoint(R, t, x1, x2):
    """Cheap 2-view triangulation for cheirality: returns depths (z1, z2).

    Camera 1 at origin; camera 2 with x2 = R x1 + t. Solves the two-ray
    least-squares depth along each bearing.
    """
    f1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    f2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
    Rf1 = p_einsum("ij,kj->ki", R, f1)
    # solve [Rf1, -f2] [d1; d2] = -t  in least squares per correspondence
    a = jnp.sum(Rf1 * Rf1, axis=-1)
    b = -jnp.sum(Rf1 * f2, axis=-1)
    c = jnp.sum(f2 * f2, axis=-1)
    rhs1 = -jnp.sum(Rf1 * t[None, :], axis=-1)
    rhs2 = jnp.sum(f2 * t[None, :], axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d1 = (c * rhs1 - b * rhs2) / det
    d2 = (a * rhs2 - b * rhs1) / det
    z1 = d1 * f1[:, 2]
    z2 = d2 * f2[:, 2]
    return z1, z2


def recover_pose_from_essential(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray
) -> tuple:
    """Decompose E into the 4 (R, t) candidates; pick by cheirality vote
    over weighted correspondences. Returns (i2Ri1 (3,3), i2Ui1 (3,)).

    Parity: recover_relative_pose_from_essential_matrix
    (/root/reference/gtsfm/utils/verification.py).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = mm(mm(U, W), Vt)
    Rb = mm(mm(U, W.T), Vt)
    t = U[:, 2]

    def vote(R, tt):
        z1, z2 = _triangulate_midpoint(R, tt, x1, x2)
        return jnp.sum(w * (z1 > 0) * (z2 > 0))

    cands_R = jnp.stack([Ra, Ra, Rb, Rb])
    cands_t = jnp.stack([t, -t, t, -t])
    votes = jax.vmap(vote)(cands_R, cands_t)
    best = jnp.argmax(votes)
    R_best = cands_R[best]
    t_best = cands_t[best]
    t_best = t_best / jnp.maximum(jnp.linalg.norm(t_best), 1e-12)
    return R_best, t_best


def _refine_essential(x1, x2, w, R0, t0, iters: int, huber: float, thresh):
    """Vmappable GN refinement of (R, t_dir) minimizing Huber Sampson error.

    x1, x2: (K, 2) normalized; w: (K,) inlier weights; R0 (3,3); t0 (3,).
    Parameterization: R = R0 exp(w_r), t = normalize(t0 + B dt) where B is
    an orthobasis of t0's tangent plane (5 DOF total — the essential
    manifold).
    """

    def make_E(R, t):
        return mm(so3.hat(t), R)

    def basis(t):
        # two vectors orthogonal to t
        a = jnp.where(jnp.abs(t[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        b1 = jnp.cross(t, a)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
        b2 = jnp.cross(t, b1)
        return jnp.stack([b1, b2], axis=-1)  # (3, 2)

    def residual(params, R, t):
        wr = params[:3]
        dt = params[3:]
        Rn = mm(R, so3.expmap(wr))
        B = basis(t)
        tn = t + p_einsum("ij,j->i", B, dt)
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        E = make_E(Rn, tn)
        err2 = _sampson_error(E, x1, x2)
        return jnp.sqrt(jnp.maximum(err2, 1e-18))  # (K,) first-order geom err

    def step(carry, _):
        R, t, lam = carry
        z5 = jnp.zeros(5)
        r = residual(z5, R, t)
        J = jax.jacfwd(residual)(z5, R, t)  # (K, 5)
        k = huber * thresh
        w_rob = jnp.minimum(1.0, k / jnp.maximum(r, 1e-12))
        ww = w * w_rob
        # K-row reductions MUST stay f32: bf16 MXU accumulation here costs
        # ~3 digits in the 5-dof GN step and measurably degrades the final
        # pose (the round-3 TPU-stream Door AUC gap)
        H = p_einsum("ki,kj->ij", J * ww[:, None], J) + lam * jnp.eye(5) * 10.0 + 1e-9 * jnp.eye(5)
        g = p_einsum("ki,k->i", J * ww[:, None], r)
        delta = jnp.linalg.solve(H, -g)

        def cost(params):
            rr = residual(params, R, t)
            rho = jnp.where(rr <= k, 0.5 * rr**2, k * (rr - 0.5 * k))
            return jnp.sum(w * rho)

        accept = cost(delta) < cost(z5)
        wr = jnp.where(accept, delta[:3], 0.0)
        dt = jnp.where(accept, delta[3:], 0.0)
        R_new = mm(R, so3.expmap(wr))
        B = basis(t)
        t_new = t + p_einsum("ij,j->i", B, dt)
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        lam_new = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e4)
        return (R_new, t_new, lam_new), None

    (R_f, t_f, _), _ = jax.lax.scan(step, (R0, t0, jnp.asarray(1e-3)), None, length=iters)
    return R_f, t_f


@partial(jax.jit, static_argnames=("opts",))
def ransac_essential(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    threshold: jnp.ndarray | float = 1e-3,
    opts: RansacOptions = RansacOptions(),
    sample_weights: jnp.ndarray | None = None,
):
    """Fixed-iteration essential RANSAC on normalized correspondences.

    x1, x2: (K, 2) normalized coords; mask: (K,) valid correspondences;
    threshold: Sampson threshold in normalized units (px_thresh / focal).

    Returns dict with i2Ri1 (3,3), i2Ui1 (3,), E (3,3), inliers bool (K,),
    num_inliers (), success ().
    """
    K = x1.shape[0]
    maskf = mask.astype(x1.dtype)
    n_valid = jnp.sum(mask)
    thresh2 = jnp.asarray(threshold) ** 2

    # sample 8-tuples without replacement. With sample_weights (e.g. match
    # similarity scores) this is PROSAC-flavored weighted sampling via the
    # exponential-keys trick: top-k of u^(1/w) draws proportionally to w —
    # the analog of USAC's quality-ordered sampling for low inlier ratios.
    if sample_weights is None:
        sw = maskf
    else:
        sw = jnp.maximum(sample_weights, 1e-6) * maskf

    # Two-stage PROSAC sampling: restrict hypothesis draws to a quality-
    # ranked pool (random tiebreak so uniform weights still spread), then
    # draw weighted 8-subsets inside it via exponential keys — top-8 of
    # u^(1/w) draws proportionally to w. The pool bounds the per-
    # hypothesis uniform tensor at (H, pool) instead of (H, K): at
    # K=1024 that is 4x fewer random bits and a 4x smaller top_k, and it
    # matches USAC's progressive quality-ordered sampling more closely.
    # (Cheaper elementwise samplers — rank-skewed draws, progressive-pool
    # strides — measurably degraded accuracy on real data: the Door
    # north-star dropped from 0.91 to 0.87 AUC@5 and the hierarchical
    # merge broke; the per-hypothesis weighted top_k stays.)
    pool = min(K, max(256, 4 * 8))
    key, k_tie = jax.random.split(key)
    tie = jax.random.uniform(k_tie, (K,), minval=0.5, maxval=1.0)
    pool_idx = jax.lax.top_k(jnp.where(mask, sw * tie, -1.0), pool)[1]  # (pool,)
    sw_pool = sw[pool_idx]
    mask_pool = mask[pool_idx]

    def sample_one(k):
        u = jax.random.uniform(k, (pool,), minval=1e-12, maxval=1.0)
        keys_w = jnp.where(mask_pool, u ** (1.0 / sw_pool), -1.0)
        return pool_idx[jax.lax.top_k(keys_w, 8)[1]]

    keys = jax.random.split(key, opts.num_hypotheses)
    sample_idx = jax.vmap(sample_one)(keys)  # i32 (H, 8)

    # hypothesis solves on the 8 GATHERED rows — O(H*8*81) instead of the
    # one-hot O(H*K*81) full-K masked einsum (128x fewer FLOPs at K=1024).
    # The mask folds into A_rows BEFORE the gather (a separate width-1
    # maskf[sample_idx] gather costs more than the width-9 row gather
    # itself on v5e), and the normal-matrix build + solve run as unstacked
    # lane math — einsum here would emit 65k MXU-padded 9x9 matmuls.
    ones = jnp.ones_like(x1[:, :1])
    p1h = jnp.concatenate([x1, ones], axis=-1)
    p2h = jnp.concatenate([x2, ones], axis=-1)
    A_rows = (p2h[:, :, None] * p1h[:, None, :]).reshape(K, 9)
    A_rows = A_rows / jnp.maximum(jnp.linalg.norm(A_rows, axis=-1, keepdims=True), 1e-12)
    A8 = (A_rows * maskf[:, None])[sample_idx]  # (H, 8, 9)
    if jax.default_backend() == "tpu":
        # unstacked lane-math build+solve: the einsum formulation emits 65k
        # MXU-padded 9x9 matmuls on TPU (~30 ms/batch vs ~2 ms)
        E_hyps = nullvec_pinned_from_rows(A8).reshape(-1, 3, 3)
    else:
        # CPU keeps the einsum formulation (no MXU padding pathology there,
        # and bit-identical results preserve the measured Door north-star
        # baseline — RANSAC votes are chaotic to float-stream changes)
        AtA_h = jnp.einsum("hkr,hks->hrs", A8, A8)
        E_hyps = nullvec_pinned_scalarized(AtA_h).reshape(-1, 3, 3)

    # preemptive scoring subset (deterministic spread over the valid set)
    if 0 < opts.score_subset < K:
        order = jnp.argsort(~mask)  # valid first
        sub = order[
            (jnp.arange(opts.score_subset) * jnp.maximum(jnp.sum(mask), 1)
             // opts.score_subset).astype(jnp.int32)
        ]
        xs1, xs2, ms = x1[sub], x2[sub], mask[sub]
    else:
        xs1, xs2, ms = x1, x2, mask

    def score(E):
        err = _sampson_error(E, xs1, xs2)
        if opts.scoring == "lmeds":
            # least median of squares: negate so argmax selects the minimum
            med = jnp.median(jnp.where(ms, err, jnp.inf))
            return -med
        if opts.scoring == "msac":
            return jnp.sum(jnp.where(ms, jnp.maximum(thresh2 - err, 0.0), 0.0))
        inl = ms & (err < thresh2)
        return jnp.sum(inl).astype(x1.dtype)

    votes = jax.vmap(score)(E_hyps)
    best = jnp.argmax(votes)
    E_best = E_hyps[best]

    # full-set model quality used by LO and the dual-start pick: truncated
    # residual gain (MSAC) under "msac"/"lmeds", inlier count otherwise
    if opts.scoring == "inliers":
        def quality(err):
            return jnp.sum(mask & (err < thresh2)).astype(x1.dtype)
    else:
        def quality(err):
            return jnp.sum(jnp.where(mask, jnp.maximum(thresh2 - err, 0.0), 0.0))

    # local optimization: annealed-threshold refits (LO-RANSAC style —
    # gather with a wide band first, tighten each round)
    def lo_round(E, mult):
        err = _sampson_error(E, x1, x2)
        inl = mask & (err < thresh2 * mult**2)
        # soft IRLS (Cauchy) weights inside the band: a leaked outlier near
        # the band edge can no longer poison the refit
        w_soft = inl.astype(x1.dtype) / (1.0 + err / jnp.maximum(thresh2, 1e-20))
        E_new = _eight_point(x1, x2, w_soft)
        # keep refit only if it does not reduce model quality
        err_new = _sampson_error(E_new, x1, x2)
        better = quality(err_new) >= quality(err)
        return jnp.where(better, E_new, E), None

    mults = jnp.linspace(2.0, 1.0, opts.lo_rounds) if opts.lo_rounds > 1 else jnp.ones(opts.lo_rounds)
    # dual-start LO: the raw nullvector hypothesis and its essential-manifold
    # projection land in slightly different basins; keep the better endpoint
    E_a, _ = jax.lax.scan(lo_round, E_best, mults)
    E_b, _ = jax.lax.scan(lo_round, _project_essential(E_best), mults)

    q_a = quality(_sampson_error(E_a, x1, x2))
    q_b = quality(_sampson_error(E_b, x1, x2))
    E_final = jnp.where(q_a >= q_b, E_a, E_b)
    err = _sampson_error(E_final, x1, x2)
    inliers = mask & (err < thresh2)

    # final GN polish on the essential manifold (5-DOF Sampson minimization)
    R0, t0 = recover_pose_from_essential(E_final, x1, x2, inliers.astype(x1.dtype))
    if opts.polish_iterations > 0:
        thresh = jnp.sqrt(thresh2)
        # keep-best guard (USAC invariant: the model only ever improves).
        # The GN polish can diverge from an already-perfect consensus
        # (zero-residual start => near-singular normal matrix); without
        # this guard a 120-inlier model was measured collapsing to 12.
        E_pre, R_pre, t_pre, inl_pre = E_final, R0, t0, inliers
        q_pre = quality(_sampson_error(E_pre, x1, x2))
        # two polish rounds with an inlier-set refresh in between: the
        # first GN pass can shake loose a few band-edge outliers, and the
        # second pass then fits the cleaned consensus
        for _ in range(2):
            R0, t0 = _refine_essential(
                x1, x2, inliers.astype(x1.dtype), R0, t0,
                opts.polish_iterations, opts.polish_huber, thresh,
            )
            E_final = mm(so3.hat(t0), R0)
            err = _sampson_error(E_final, x1, x2)
            inliers = mask & (err < thresh2)
        R0, t0 = recover_pose_from_essential(E_final, x1, x2, inliers.astype(x1.dtype))
        worse = quality(_sampson_error(E_final, x1, x2)) < q_pre
        E_final = jnp.where(worse, E_pre, E_final)
        R0 = jnp.where(worse, R_pre, R0)
        t0 = jnp.where(worse, t_pre, t0)
        inliers = jnp.where(worse, inl_pre, inliers)
    num_inliers = jnp.sum(inliers)
    R, t = R0, t0
    success = (num_inliers >= opts.min_inliers) & (n_valid >= 8)
    return {
        "i2Ri1": R,
        "i2Ui1": t,
        "E": E_final,
        "E_vote": E_best,
        "E_a": E_a,
        "E_b": E_b,
        "inliers": inliers,
        "num_inliers": num_inliers,
        "success": success,
    }


def ransac_essential_pixels(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    cal1,
    cal2,
    key: jax.Array,
    threshold_px: float = 4.0,
    opts: RansacOptions = RansacOptions(),
):
    """Pixel-space wrapper: normalizes by intrinsics, converts the pixel
    threshold with the mean focal (matches the reference's use of focal-
    normalized USAC thresholds)."""
    x1 = cal1.calibrate(uv1)
    x2 = cal2.calibrate(uv2)
    f_mean = 0.5 * (jnp.mean(jnp.atleast_1d(cal1.fx)) + jnp.mean(jnp.atleast_1d(cal2.fx)))
    thresh = threshold_px / jnp.maximum(f_mean, 1e-6)
    return ransac_essential(x1, x2, mask, key, threshold=thresh, opts=opts)
