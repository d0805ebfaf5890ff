"""Fundamental-matrix RANSAC + homography degeneracy check.

Parity: /root/reference/gtsfm/frontend/verifier/ — the FUNDAMENTAL_MATRIX
estimation mode of OpencvVerifierBase (7/8-pt USAC, used when intrinsics
are unshared/unknown, verifier_base.py), F -> E upgrade
(utils/verification.py), and GricVerifier's H-vs-F GRIC model selection
(gric_verifier.py, pycolmap) used to reject planar/degenerate pairs.

Same TPU shape as the essential verifier: static hypothesis batches of
pinned-nullvector solves, masked scoring, exact refits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsfm_tpu.utils.numerics import einsum as p_einsum, mm, nullvec_pinned


class FundamentalOptions(NamedTuple):
    num_hypotheses: int = 512
    lo_rounds: int = 3
    min_inliers: int = 8
    # DEGENSAC (Chum et al., "Two-View Geometry Estimation Unaffected by a
    # Dominant Plane"; parity: frontend/verifier/degensac.py via pydegensac):
    # when a homography explains >= h_ratio of the F inliers, the epipolar
    # geometry was likely fit to the plane; re-estimate F by plane-and-
    # parallax (F = [e']_x H with the epipole voted by off-plane points)
    # and keep whichever model scores more inliers.
    degensac: bool = False
    degensac_h_ratio: float = 0.7
    degensac_h_hypotheses: int = 128


def _hartley_normalize(x: jnp.ndarray, w: jnp.ndarray):
    """Similarity transform making weighted points zero-mean, sqrt(2)-rms."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu = jnp.sum(x * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum(jnp.sum((x - mu) ** 2, -1) * w) / wsum)
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    T = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], x.dtype) * s
    T = T.at[2, 2].set(1.0).at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
    return (x - mu) * s, T


def _f_normal_matrix(x1, x2, w):
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], -1)
    p2 = jnp.concatenate([x2, ones], -1)
    A = (p2[:, :, None] * p1[:, None, :]).reshape(-1, 9)
    nrm = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(nrm, 1e-12)
    return p_einsum("ki,kj->ij", A * w[:, None], A)


def _rank2(F):
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return mm(U * S[None, :], Vt)


def _sampson_f(F, x1, x2):
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], -1)
    p2 = jnp.concatenate([x2, ones], -1)
    Fx1 = p_einsum("ij,kj->ki", F, p1)
    Ftx2 = p_einsum("ji,kj->ki", F, p2)
    num = jnp.sum(p2 * Fx1, -1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("opts",))
def ransac_fundamental(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    threshold_px: float = 3.0,
    opts: FundamentalOptions = FundamentalOptions(),
):
    """Pixel-space fundamental RANSAC with Hartley normalization.

    Returns dict with F (3,3), inliers (K,), num_inliers, success."""
    K = uv1.shape[0]
    maskf = mask.astype(uv1.dtype)
    x1n, T1 = _hartley_normalize(uv1, maskf)
    x2n, T2 = _hartley_normalize(uv2, maskf)
    # normalized threshold: scale by T's isotropic factor
    s_avg = 0.5 * (T1[0, 0] + T2[0, 0])
    thresh2 = (threshold_px * s_avg) ** 2

    def sample_one(k):
        scores = jax.random.uniform(k, (K,)) * maskf
        idx = jax.lax.top_k(scores, 8)[1]
        ar = jnp.arange(K)
        return jnp.any(ar[None, :] == idx[:, None], axis=0).astype(uv1.dtype) * maskf

    keys = jax.random.split(key, opts.num_hypotheses)
    sample_w = jax.vmap(sample_one)(keys)

    def score(w):
        Fh = nullvec_pinned(_f_normal_matrix(x1n, x2n, w)).reshape(3, 3)
        err = _sampson_f(Fh, x1n, x2n)
        return jnp.sum(mask & (err < thresh2)), Fh

    votes, Fs = jax.vmap(score)(sample_w)
    best = jnp.argmax(votes)
    F_best = Fs[best]

    def lo_round(F, mult):
        err = _sampson_f(F, x1n, x2n)
        inl = mask & (err < thresh2 * mult**2)
        w_soft = inl.astype(uv1.dtype) / (1.0 + err / jnp.maximum(thresh2, 1e-20))
        AtA = _f_normal_matrix(x1n, x2n, w_soft)
        _, vecs = jnp.linalg.eigh(AtA)
        F_new = _rank2(vecs[:, 0].reshape(3, 3))
        better = jnp.sum(mask & (_sampson_f(F_new, x1n, x2n) < thresh2)) >= jnp.sum(
            mask & (err < thresh2)
        )
        return jnp.where(better, F_new, F), None

    mults = jnp.linspace(2.0, 1.0, opts.lo_rounds)
    F_final, _ = jax.lax.scan(lo_round, _rank2(F_best), mults)

    if opts.degensac:
        F_final = _degensac_recover(
            x1n, x2n, mask, F_final, thresh2, jax.random.fold_in(key, 77),
            h_ratio=opts.degensac_h_ratio,
            h_hypotheses=opts.degensac_h_hypotheses,
            lo_round=lo_round,
            lo_mults=mults,
        )

    err = _sampson_f(F_final, x1n, x2n)
    inliers = mask & (err < thresh2)
    # denormalize: F = T2^T Fn T1
    F_px = mm(mm(T2.T, F_final), T1)
    F_px = F_px / jnp.maximum(jnp.linalg.norm(F_px), 1e-12)
    return {
        "F": F_px,
        "inliers": inliers,
        "num_inliers": jnp.sum(inliers),
        "success": (jnp.sum(inliers) >= opts.min_inliers),
    }


def _degensac_recover(x1n, x2n, mask, F, thresh2, key, h_ratio, h_hypotheses,
                      lo_round, lo_mults):
    """Plane-and-parallax re-estimation when F was fit to a dominant plane.

    All in Hartley-normalized coordinates. 1) RANSAC a homography over the
    F inliers; 2) if it explains >= h_ratio of them, the sample geometry is
    H-degenerate; 3) vote the epipole e' from the off-plane inliers (each
    contributes the line p2 x H p1, all of which pass through e'),
    4) candidate F_pp = [e']_x H, LO-polished; keep the better scorer.
    """
    f_err = _sampson_f(F, x1n, x2n)
    f_inl = mask & (f_err < thresh2)
    w_inl = f_inl.astype(x1n.dtype)
    K = x1n.shape[0]

    # homography RANSAC restricted to the F inliers
    def sample_one(k):
        scores = jax.random.uniform(k, (K,)) * w_inl
        idx = jax.lax.top_k(scores, 4)[1]
        ar = jnp.arange(K)
        return jnp.any(ar[None, :] == idx[:, None], axis=0).astype(x1n.dtype) * w_inl

    keys = jax.random.split(key, h_hypotheses)
    sample_w = jax.vmap(sample_one)(keys)

    def score_h(w):
        Hh = nullvec_pinned(_h_normal_matrix(x1n, x2n, w)).reshape(3, 3)
        return jnp.sum(f_inl & (_h_transfer_err(Hh, x1n, x2n) < thresh2)), Hh

    votes, Hs = jax.vmap(score_h)(sample_w)
    H = Hs[jnp.argmax(votes)]

    # LO the homography on its consensus: a raw 4-point H is noisy, and the
    # parallax lines p2 x Hp1 inherit that noise directly — the epipole
    # vote needs a tight plane fit
    def h_refit(H_c, _):
        e_c = _h_transfer_err(H_c, x1n, x2n)
        w_c = jnp.where(
            f_inl, jnp.maximum(0.0, 1.0 - e_c / thresh2), 0.0
        ).astype(x1n.dtype)
        AtA = _h_normal_matrix(x1n, x2n, w_c)
        _, vecs = jnp.linalg.eigh(AtA)
        H_new = vecs[:, 0].reshape(3, 3)
        n_new = jnp.sum(f_inl & (_h_transfer_err(H_new, x1n, x2n) < thresh2))
        n_old = jnp.sum(f_inl & (e_c < thresh2))
        return jnp.where(n_new >= n_old, H_new, H_c), None

    H, _ = jax.lax.scan(h_refit, H, jnp.arange(3))
    h_err = _h_transfer_err(H, x1n, x2n)
    n_f = jnp.maximum(jnp.sum(f_inl), 1)
    degenerate = (jnp.sum(f_inl & (h_err < thresh2)) / n_f) >= h_ratio

    # Plane-and-parallax inner RANSAC: each correspondence OFF the plane
    # contributes the line p2 x (H p1), and all such lines concur at the
    # epipole e'. Off-plane candidates include gross outliers, so e' is
    # voted by sampling candidate pairs (line intersections) and scoring
    # the implied F = [e']_x H over all correspondences.
    off = mask & (h_err >= thresh2)
    ones = jnp.ones_like(x1n[:, :1])
    p1 = jnp.concatenate([x1n, ones], -1)
    p2 = jnp.concatenate([x2n, ones], -1)
    Hp1 = p_einsum("ij,kj->ki", H, p1)
    lines = jnp.cross(p2, Hp1)
    lines = lines / jnp.maximum(jnp.linalg.norm(lines, axis=-1, keepdims=True), 1e-12)
    offf = off.astype(x1n.dtype)

    def score_pair(k):
        ka, kb = jax.random.split(k)
        a = jnp.argmax(jax.random.uniform(ka, (K,)) * offf)
        ub = jax.random.uniform(kb, (K,)) * offf
        b = jnp.argmax(ub.at[a].set(-1.0))  # distinct second point
        e2 = jnp.cross(lines[a], lines[b])
        ex = jnp.array(
            [[0.0, -e2[2], e2[1]], [e2[2], 0.0, -e2[0]], [-e2[1], e2[0], 0.0]],
            x1n.dtype,
        )
        F_c = mm(ex, H)
        nrm = jnp.linalg.norm(F_c)
        F_c = F_c / jnp.maximum(nrm, 1e-12)
        ok = nrm > 1e-9  # parallel lines / repeated point => no epipole
        # MSAC-score over OFF-plane candidates only. Every H-consistent
        # point satisfies ANY F of the form [e']_x H (p2 ~ Hp1 =>
        # p2.(e' x p2) = 0), so plane inliers are uninformative padding;
        # and the truncated-residual score separates a true epipole (all
        # off-plane points fit tightly) from an outlier-anchored one whose
        # extra "inliers" graze the threshold band.
        err_c = _sampson_f(F_c, x1n, x2n)
        msac = jnp.sum(jnp.where(off, jnp.maximum(0.0, 1.0 - err_c / thresh2), 0.0))
        return jnp.where(ok, msac, -1.0), F_c

    # 4x the H budget: a candidate needs BOTH sampled anchors off-plane,
    # and off-plane points can be a small minority of the off set
    pp_keys = jax.random.split(jax.random.fold_in(key, 1), 4 * h_hypotheses)
    pp_votes, pp_Fs = jax.vmap(score_pair)(pp_keys)

    # Constrained LO: refit ONLY the epipole over the off-plane inliers of
    # the winning candidate (every off-plane inlier line passes through e',
    # so e' = smallest eigenvector of the weighted sum of l l^T — closed
    # form). A full-F refit here would be plane-dominated and collapse back
    # to the degenerate solution the recovery just escaped.
    def off_msac(F_c):
        err_c = _sampson_f(F_c, x1n, x2n)
        return jnp.sum(jnp.where(off, jnp.maximum(0.0, 1.0 - err_c / thresh2), 0.0))

    def refit_epipole(F_c, _):
        err_c = _sampson_f(F_c, x1n, x2n)
        w_l = jnp.where(off, jnp.maximum(0.0, 1.0 - err_c / thresh2), 0.0)
        L = p_einsum("ki,kj->ij", lines * w_l[:, None], lines)
        _, vecs = jnp.linalg.eigh(L)
        e2 = vecs[:, 0]
        ex = jnp.array(
            [[0.0, -e2[2], e2[1]], [e2[2], 0.0, -e2[0]], [-e2[1], e2[0], 0.0]],
            x1n.dtype,
        )
        F_new = mm(ex, H)
        F_new = F_new / jnp.maximum(jnp.linalg.norm(F_new), 1e-12)
        better = (off_msac(F_new) >= off_msac(F_c)) & (jnp.sum(w_l > 0) >= 2)
        return jnp.where(better, F_new, F_c), None

    # polish the top-8 candidates before the final pick: a correct but
    # noisy anchor pair often scores below an outlier-anchored candidate
    # until its epipole is refit over its full off-plane consensus
    _, top8 = jax.lax.top_k(pp_votes, 8)
    F_top = pp_Fs[top8]

    def polish(F_c):
        F_c, _ = jax.lax.scan(refit_epipole, F_c, jnp.arange(2))
        return off_msac(F_c), F_c

    top_scores, F_polished = jax.vmap(polish)(F_top)
    F_pp = F_polished[jnp.argmax(top_scores)]
    F_pp, _ = jax.lax.scan(refit_epipole, F_pp, jnp.arange(1))

    # accept by truncated-residual quality over ALL correspondences, not
    # raw inlier count: a plane-fooled F that grabbed a few outliers can
    # TIE the true F's count (plane + k noise points vs plane + k true
    # off-plane), but the true F fits its non-plane inliers tightly while
    # the fooled F's extras graze the threshold band
    def full_msac(F_c):
        err_c = _sampson_f(F_c, x1n, x2n)
        return jnp.sum(jnp.where(mask, jnp.maximum(0.0, 1.0 - err_c / thresh2), 0.0))

    use_pp = (
        degenerate
        & (jnp.max(top_scores) > 0)
        & (jnp.sum(off) >= 2)
        & (full_msac(F_pp) > full_msac(F))
        & jnp.all(jnp.isfinite(F_pp))
    )
    return jnp.where(use_pp, F_pp, F)


def fundamental_to_essential(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    """E = K2^T F K1 projected to the essential manifold.

    Parity: utils/verification.py fundamental_to_essential."""
    E = mm(mm(K2.T, F), K1)
    U, _, Vt = jnp.linalg.svd(E)
    S = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return mm(U * S[None, :], Vt)


# ---- homography + GRIC model selection ------------------------------------


def _h_normal_matrix(x1, x2, w):
    """DLT rows for homography x2 ~ H x1 (2 rows per correspondence)."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], -1)  # (K, 3)
    zeros = jnp.zeros_like(p1)
    u2 = x2[:, 0:1]
    v2 = x2[:, 1:2]
    r1 = jnp.concatenate([p1, zeros, -u2 * p1], -1)  # (K, 9)
    r2 = jnp.concatenate([zeros, p1, -v2 * p1], -1)
    A = jnp.concatenate([r1, r2], 0)
    ww = jnp.concatenate([w, w])
    nrm = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(nrm, 1e-12)
    return p_einsum("ki,kj->ij", A * ww[:, None], A)


def _h_transfer_err(H, x1, x2):
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], -1)
    q = p_einsum("ij,kj->ki", H, p1)
    q = q[:, :2] / jnp.where(jnp.abs(q[:, 2:]) < 1e-12, 1e-12, q[:, 2:])
    return jnp.sum((q - x2) ** 2, -1)


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_homography(
    uv1, uv2, mask, key, threshold_px: float = 3.0, num_hypotheses: int = 256
):
    """Homography RANSAC (4-point DLT hypotheses via pinned nullvector)."""
    K = uv1.shape[0]
    maskf = mask.astype(uv1.dtype)
    x1n, T1 = _hartley_normalize(uv1, maskf)
    x2n, T2 = _hartley_normalize(uv2, maskf)
    s_avg = 0.5 * (T1[0, 0] + T2[0, 0])
    thresh2 = (threshold_px * s_avg) ** 2

    def sample_one(k):
        scores = jax.random.uniform(k, (K,)) * maskf
        idx = jax.lax.top_k(scores, 4)[1]
        ar = jnp.arange(K)
        return jnp.any(ar[None, :] == idx[:, None], axis=0).astype(uv1.dtype) * maskf

    keys = jax.random.split(key, num_hypotheses)
    sample_w = jax.vmap(sample_one)(keys)

    def score(w):
        Hh = nullvec_pinned(_h_normal_matrix(x1n, x2n, w)).reshape(3, 3)
        err = _h_transfer_err(Hh, x1n, x2n)
        return jnp.sum(mask & (err < thresh2)), Hh

    votes, Hs = jax.vmap(score)(sample_w)
    best = jnp.argmax(votes)
    H = Hs[best]
    err = _h_transfer_err(H, x1n, x2n)
    inliers = mask & (err < thresh2)
    return {"H": H, "inliers": inliers, "num_inliers": jnp.sum(inliers)}


def gric_select_model(
    f_inliers: jnp.ndarray, h_inliers: jnp.ndarray, mask: jnp.ndarray,
    h_f_inlier_ratio_threshold: float = 0.8,
):
    """Degeneracy check: if the homography explains nearly as many
    correspondences as F/E, the pair is planar/rotation-only and unreliable
    for relative-pose recovery (GricVerifier's decision rule).

    Returns (is_degenerate bool, hf_ratio)."""
    nf = jnp.maximum(jnp.sum(f_inliers & mask), 1)
    nh = jnp.sum(h_inliers & mask)
    ratio = nh / nf
    return ratio >= h_f_inlier_ratio_threshold, ratio
