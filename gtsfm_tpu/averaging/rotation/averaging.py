"""Global rotation averaging: chordal initialization + robust manifold LM.

Parity: /root/reference/gtsfm/averaging/rotation/shonan.py:39
(ShonanRotationAveraging: GTSAM ShonanAveraging3 with chordal init via
InitializePose3.initializeOrientations, inverse-#inlier noise weighting,
index densification, retry without weights).

TPU-first re-design. GTSAM's Shonan is an SO(p) staircase solved by CPU
trust-region; here the same estimate is produced by
  1. chordal relaxation — three decoupled (3N x 3N) linear solves on the
     block graph Laplacian (dense Cholesky on the MXU; cameras per cluster
     are bounded by the graph partitioner), then SVD projection to SO(3);
  2. robust (Huber-IRLS) Gauss-Newton on the tangent space minimizing
     sum_e w_e ||Log(R_j^T R_e R_i)||^2 — fixed-iteration lax.scan, fully
     jit; Jacobians via vmapped forward-mode autodiff.
Chordal + local refinement reaches the certified Shonan optimum in practice
for inlier-dominated graphs (the cycle-consistency view-graph filter runs
first in the pipeline). For adversarial graphs that fail the optimality
certificate, `shonan_staircase` provides the SO(p) Riemannian-staircase
escape (lift to St(3,p), follow the certificate's negative eigenvector,
re-descend, re-certify, round back to SO(3)) — the same mechanism as GTSAM
ShonanAveraging3's p=3..64 staircase (shonan.py:59-61), expressed as dense
MXU matmuls over the block cost matrix instead of a CPU trust-region solver.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import so3
from gtsfm_tpu.utils.numerics import einsum as p_einsum, mm, precise


class RotationAveragingOptions(NamedTuple):
    max_iterations: int = 30
    robust_huber_rad: float = 0.1  # ~5.7 deg
    init_lambda: float = 1e-6
    weight_by_inliers: bool = True
    # after the first refine, drop edges whose residual exceeds this and
    # refine again (0 = disabled) — outlier edges otherwise bias the mean
    # even under Huber
    rerefine_reject_deg: float = 10.0
    # SO(p) Riemannian-staircase escape when the chordal solution fails the
    # global-optimality certificate (parity: ShonanAveraging3 p-staircase,
    # shonan.py:59-61). 3 = disabled (plain chordal + GN).
    staircase_p_max: int = 6


def chordal_init(
    num_images: int,
    edges: jnp.ndarray,  # i32[E, 2] (i1, i2) with i1 < i2
    i2Ri1: jnp.ndarray,  # f32[E, 3, 3]
    edge_weight: jnp.ndarray,  # f32[E] (0 = masked out)
    anchor: int = 0,
) -> jnp.ndarray:
    """Chordal relaxation: minimize sum_e w_e ||X_i1 - i2Ri1^T X_i2||_F^2
    with X_anchor = I, over unconstrained 3x3 X; project result to SO(3).

    Solves one (3N, 3N) SPD system for all three columns at once (dense
    Cholesky — MXU work). Parity: InitializePose3.initializeOrientations
    (used at shonan.py:185-204).
    """
    n = num_images
    i1 = edges[:, 0]
    i2 = edges[:, 1]
    w = edge_weight
    # Edge residual: X_i1 - R_e^T X_i2, where R_e = i2Ri1 (maps frame i1->i2
    # vectors), since wRi1 = wRi2 @ i2Ri1 => X_i1 = X_i2 @ i2Ri1... careful:
    # global rotations satisfy i2Ri1 = wRi2^T wRi1, i.e. wRi1 = wRi2 i2Ri1.
    # With X_i = wRi (3x3), columns do NOT decouple under right
    # multiplication; instead solve for X_i^T = wRi^T: wRi1^T = i2Ri1^T wRi2^T
    # -> column-decoupled with left multiplication by A_e = i2Ri1^T.
    A = jnp.swapaxes(i2Ri1, -1, -2)  # (E, 3, 3)

    # Build block Laplacian H (3N, 3N): for each edge, unknowns y_i1, y_i2
    # (columns of X^T), residual y_i1 - A_e y_i2.
    # H[i1,i1] += w I; H[i2,i2] += w A^T A (= w I, A rotation); off-diag
    # H[i1,i2] -= w A; H[i2,i1] -= w A^T.
    eyeE = jnp.broadcast_to(jnp.eye(3), A.shape) * w[:, None, None]
    H = jnp.zeros((n, n, 3, 3))
    H = H.at[i1, i1].add(eyeE)
    H = H.at[i2, i2].add(eyeE)
    H = H.at[i1, i2].add(-w[:, None, None] * A)
    H = H.at[i2, i1].add(-w[:, None, None] * jnp.swapaxes(A, -1, -2))
    Hd = H.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)

    # anchor: y_anchor = each basis vector e_c. Eliminate by moving to rhs.
    # rhs_c = -H[:, anchor] e_c ; unknowns exclude anchor rows/cols.
    mask = jnp.arange(n) != anchor
    idx = jnp.nonzero(mask, size=n - 1)[0]
    rows = (idx[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)
    H_red = Hd[rows][:, rows]
    anchor_cols = (anchor * 3 + jnp.arange(3))
    B = -Hd[rows][:, anchor_cols]  # (3(n-1), 3) rhs for the 3 columns
    # small ridge for isolated nodes
    H_red = H_red + 1e-6 * jnp.eye(H_red.shape[0])
    Y = jax.scipy.linalg.solve(H_red, B, assume_a="pos")  # (3(n-1), 3)

    # Block i of the solution stacks [y^0_i | y^1_i | y^2_i] as columns,
    # which is exactly Y_i = wRi^T; so wRi = Y_i^T, then project to SO(3).
    Yt = jnp.zeros((n, 3, 3))
    Yt = Yt.at[anchor].set(jnp.eye(3))
    Yt = Yt.at[idx].set(Y.reshape(n - 1, 3, 3))
    R = jnp.swapaxes(Yt, -1, -2)
    return so3.project(R)


def _build_cost_matrix(num_images, edges, i2Ri1, edge_weight) -> np.ndarray:
    """Dense (3N, 3N) block cost matrix Q of the chordal objective.

    f = sum_ij tr(G_i Q_ij G_j^T) with G_i = wRi at p=3; the same Q the
    certificate uses (blocks of sum_e w_e ||Y_i1 - i2Ri1^T Y_i2||_F^2 with
    Y_i = wRi^T).
    """
    n = num_images
    i1 = np.asarray(edges[:, 0], int)
    i2 = np.asarray(edges[:, 1], int)
    w = np.asarray(edge_weight, np.float64)
    A = np.transpose(np.asarray(i2Ri1, np.float64), (0, 2, 1))
    Q = np.zeros((n, n, 3, 3))
    eye = np.eye(3)
    np.add.at(Q, (i1, i1), w[:, None, None] * eye)
    np.add.at(Q, (i2, i2), w[:, None, None] * eye)
    np.add.at(Q, (i1, i2), -w[:, None, None] * A)
    np.add.at(Q, (i2, i1), -w[:, None, None] * np.transpose(A, (0, 2, 1)))
    return Q.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)


def _qf_retract(G: jnp.ndarray) -> jnp.ndarray:
    """Block-wise QR retraction onto the product Stiefel St(3, p).

    G: (p, 3n) with column-blocks G_i (p, 3); returns same shape with each
    block replaced by the Q factor (sign-fixed so the map is continuous —
    at p=3 this preserves det(G_i) = +1, keeping iterates in SO(3)^n).
    """
    p = G.shape[0]
    n = G.shape[1] // 3
    B = G.reshape(p, n, 3).transpose(1, 0, 2)  # (n, p, 3)
    q, r = jnp.linalg.qr(B)
    sgn = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    q = q * sgn[:, None, :]
    return q.transpose(1, 0, 2).reshape(p, 3 * n)


@partial(jax.jit, static_argnames=("iters",))
@precise
def _stiefel_descend(Q: jnp.ndarray, G0: jnp.ndarray, iters: int = 150):
    """Riemannian gradient descent of f(G) = tr(G Q G^T) over St(3,p)^n.

    Adaptive step with accept/reject inside a lax.scan — dense matmuls only
    (MXU work). Returns (G, final cost).
    """
    p = G0.shape[0]
    n = G0.shape[1] // 3

    def cost(G):
        return jnp.sum(mm(G, Q) * G)

    def rgrad(G):
        E = 2.0 * mm(G, Q)  # Euclidean gradient
        Gb = G.reshape(p, n, 3)
        Eb = E.reshape(p, n, 3)
        M = p_einsum("pni,pnj->nij", Gb, Eb)
        M = 0.5 * (M + jnp.swapaxes(M, -1, -2))
        tang = Eb - p_einsum("pni,nij->pnj", Gb, M)
        return tang.reshape(p, 3 * n)

    # initial step from the gradient scale
    g0 = rgrad(G0)
    gnorm = jnp.linalg.norm(g0) + 1e-12
    step0 = 0.1 / gnorm * jnp.sqrt(jnp.asarray(3.0 * n))

    def body(carry, _):
        G, step, f = carry
        g = rgrad(G)
        cand = _qf_retract(G - step * g)
        f_cand = cost(cand)
        accept = f_cand < f
        G_next = jnp.where(accept, cand, G)
        step_next = jnp.clip(jnp.where(accept, step * 1.4, step * 0.4), 1e-14, 1e6)
        return (G_next, step_next, jnp.where(accept, f_cand, f)), None

    (G_f, _, f_f), _ = jax.lax.scan(body, (G0, step0, cost(G0)), None, length=iters)
    return G_f, f_f


def _certificate_from_G(Q64: np.ndarray, G: np.ndarray, tol: float):
    """(certified, min_eig, eigvec) of S = Q - blockdiag(Lambda) at G."""
    n = Q64.shape[0] // 3
    G = np.asarray(G, np.float64)
    M = Q64 @ (G.T @ G)
    S = Q64.copy()
    for i in range(n):
        blk = M[3 * i : 3 * i + 3, 3 * i : 3 * i + 3]
        S[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] -= 0.5 * (blk + blk.T)
    vals, vecs = np.linalg.eigh(S)
    scale = max(1.0, abs(vals[-1]))
    return vals[0] >= -tol * scale, float(vals[0]), vecs[:, 0]


def _round_to_so3(G: np.ndarray) -> np.ndarray:
    """Round a rank-p staircase solution to SO(3)^n (SE-Sync-style).

    Top-3 SVD of G (the left O(p) factor is gauge), global reflection fix by
    majority determinant, then per-block projection to the nearest rotation.
    """
    n = G.shape[1] // 3
    _, s, Vt = np.linalg.svd(np.asarray(G, np.float64), full_matrices=False)
    Gh = (s[:3, None] * Vt[:3]).reshape(3, n, 3).transpose(1, 0, 2)  # (n, 3, 3)
    dets = np.linalg.det(Gh)
    if np.median(dets) < 0:
        Gh = Gh * np.array([1.0, 1.0, -1.0])[None, :, None]
    return np.asarray(so3.project(jnp.asarray(Gh, jnp.float32)))


def shonan_staircase(
    num_images: int,
    edges: np.ndarray,
    i2Ri1: np.ndarray,
    edge_weight: np.ndarray,
    wRi_init: np.ndarray,
    p_max: int = 6,
    descent_iters: int = 150,
    tol: float = 1e-6,
) -> tuple:
    """SO(p) Riemannian staircase for globally-optimal rotation averaging.

    Parity: GTSAM ShonanAveraging3's p=3..64 staircase as used by
    ShonanRotationAveraging (shonan.py:39,59-61). TPU-first: the chordal
    cost is a single dense (3N,3N) matrix; each rung is jit-compiled
    Riemannian gradient descent over the product Stiefel manifold (pure
    matmuls + blocked QR), the certificate is one eigendecomposition, and
    the escape direction is the certificate's negative eigenvector lifted
    to the new rank (second-order descent direction, SE-Sync Prop. 12).

    Returns (wRi [N,3,3] float32, certified: bool, min_eig: float).
    """
    Q64 = _build_cost_matrix(num_images, edges, i2Ri1, edge_weight)
    Q32 = jnp.asarray(Q64, jnp.float32)
    # G at p=3 stacks the rotations themselves: G[:, 3i:3i+3] = wRi[i]
    G = np.asarray(wRi_init, np.float64).transpose(1, 0, 2).reshape(3, 3 * num_images)

    certified, min_eig = False, -np.inf
    for p in range(3, p_max + 1):
        G_j, _ = _stiefel_descend(Q32, jnp.asarray(G, jnp.float32), iters=descent_iters)
        G = np.asarray(G_j, np.float64)
        certified, min_eig, v = _certificate_from_G(Q64, G, tol)
        if certified or p == p_max:
            break
        # lift one rank and escape along the negative-curvature direction:
        # new row = eigenvector v (per-block tangent e_{p+1} v_i^T)
        G_lift = np.vstack([G, np.zeros(3 * num_images)])
        D = np.zeros_like(G_lift)
        D[-1] = v
        f0 = float(np.sum((G_lift @ Q64) * G_lift))
        best, best_f = G_lift, f0
        for t in np.geomspace(1e-3, 10.0, 12):
            for sgn in (1.0, -1.0):
                cand = np.asarray(
                    _qf_retract(jnp.asarray(G_lift + sgn * t * D, jnp.float32)), np.float64
                )
                f = float(np.sum((cand @ Q64) * cand))
                if f < best_f:
                    best, best_f = cand, f
        G = best

    wRi = _round_to_so3(G)
    if G.shape[0] > 3:
        # polish the rounded solution at p=3 and re-certify it
        G3 = wRi.astype(np.float64).transpose(1, 0, 2).reshape(3, 3 * num_images)
        G3_j, _ = _stiefel_descend(Q32, jnp.asarray(G3, jnp.float32), iters=descent_iters)
        G3 = np.asarray(G3_j, np.float64)
        certified, min_eig, _ = _certificate_from_G(Q64, G3, tol)
        wRi = _round_to_so3(G3)
    # anchor: left-multiply so camera 0 is identity (cost is left-invariant)
    S0 = wRi[0].T.copy()
    wRi = np.einsum("ij,njk->nik", S0, wRi).astype(np.float32)
    return np.asarray(so3.project(jnp.asarray(wRi))), certified, min_eig


def _edge_residual(wRi1, wRi2, R_e):
    """Log( (wRi2 i2Ri1)^T wRi1 ) — zero when consistent."""
    return so3.logmap(mm(jnp.swapaxes(mm(wRi2, R_e), -1, -2), wRi1))


@jax.jit
@precise
def _edge_residual_gathered(wRi, edges, R_e):
    """_edge_residual over edge-gathered rotations as ONE compiled unit."""
    return _edge_residual(wRi[edges[:, 0]], wRi[edges[:, 1]], R_e)


@partial(jax.jit, static_argnames=("num_images", "opts"))
@precise
def _refine(
    num_images: int,
    wRi0: jnp.ndarray,
    edges: jnp.ndarray,
    i2Ri1: jnp.ndarray,
    edge_weight: jnp.ndarray,
    opts: RotationAveragingOptions,
):
    """Robust Gauss-Newton on tangent space; returns refined wRi [N, 3, 3]."""
    n = num_images
    i1 = edges[:, 0]
    i2 = edges[:, 1]

    def cost_and_system(wRi):
        R1 = wRi[i1]
        R2 = wRi[i2]
        r = _edge_residual(R1, R2, i2Ri1)  # (E, 3)

        def local_resid(xi1, xi2, R1_, R2_, Re_):
            return _edge_residual(mm(R1_, so3.expmap(xi1)), mm(R2_, so3.expmap(xi2)), Re_)

        z3 = jnp.zeros(3)
        J1, J2 = jax.vmap(
            jax.jacfwd(local_resid, argnums=(0, 1)), in_axes=(None, None, 0, 0, 0)
        )(z3, z3, R1, R2, i2Ri1)  # (E, 3, 3) each

        nrm = jnp.linalg.norm(r, axis=-1)
        k = opts.robust_huber_rad
        w_rob = jnp.minimum(1.0, k / jnp.maximum(nrm, 1e-12)) if k > 0 else jnp.ones_like(nrm)
        w = edge_weight * w_rob

        # assemble dense block H (N, N, 3, 3) and gradient (N, 3)
        wJ1 = J1 * w[:, None, None]
        wJ2 = J2 * w[:, None, None]
        H = jnp.zeros((n, n, 3, 3))
        H = H.at[i1, i1].add(p_einsum("eri,erj->eij", wJ1, J1))
        H = H.at[i2, i2].add(p_einsum("eri,erj->eij", wJ2, J2))
        H = H.at[i1, i2].add(p_einsum("eri,erj->eij", wJ1, J2))
        H = H.at[i2, i1].add(p_einsum("eri,erj->eij", wJ2, J1))
        g = jnp.zeros((n, 3))
        g = g.at[i1].add(p_einsum("eri,er->ei", wJ1, r))
        g = g.at[i2].add(p_einsum("eri,er->ei", wJ2, r))

        quad = 0.5 * nrm**2
        lin = k * (nrm - 0.5 * k)
        rho = jnp.where(nrm <= k, quad, lin) if k > 0 else quad
        cost = jnp.sum(edge_weight * rho)
        return cost, H, g

    def step(carry, _):
        wRi, lam, cost = carry
        _, H, g = cost_and_system(wRi)
        Hd = H.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)
        Hd = Hd + lam * jnp.diag(jnp.diag(Hd)) + (lam + 1e-8) * jnp.eye(3 * n)
        # gauge: anchor node 0 (H singular otherwise up to global rotation)
        delta = jax.scipy.linalg.solve(Hd, -g.reshape(-1), assume_a="pos").reshape(n, 3)
        delta = delta.at[0].set(0.0)
        cand = mm(wRi, so3.expmap(delta))
        new_cost, _, _ = cost_and_system(cand)
        accept = new_cost < cost
        wRi_next = jnp.where(accept, cand, wRi)
        lam_next = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e6)
        return (wRi_next, lam_next, jnp.where(accept, new_cost, cost)), cost

    cost0, _, _ = cost_and_system(wRi0)
    (wRi_f, _, _), _ = jax.lax.scan(
        step, (wRi0, jnp.asarray(opts.init_lambda), cost0), None, length=opts.max_iterations
    )
    return wRi_f


class RotationAveraging:
    """Global rotation averaging (drop-in for the reference's Shonan stage).

    run(num_images, edges, i2Ri1, num_inliers) -> (wRi [N,3,3], valid [N])
    Cameras with no edges get valid=False and identity rotation; callers
    prune to the largest connected component first (as the reference's MVO
    does, multi_view_optimizer.py:175-177).
    """

    def __init__(self, options: RotationAveragingOptions = RotationAveragingOptions()):
        self.options = options

    def run(
        self,
        num_images: int,
        edges: np.ndarray,
        i2Ri1: np.ndarray,
        num_inliers: np.ndarray | None = None,
        edge_mask: np.ndarray | None = None,
    ):
        edges = np.asarray(edges, np.int32)
        E = len(edges)
        if E == 0:
            return np.tile(np.eye(3, dtype=np.float32), (num_images, 1, 1)), np.zeros(
                num_images, bool
            )
        if edge_mask is None:
            edge_mask = np.ones(E, bool)
        if num_inliers is None or not self.options.weight_by_inliers:
            w = edge_mask.astype(np.float32)
        else:
            # inverse-#inlier sigma => weight proportional to #inliers
            # (shonan.py:92-95 uses sigma = 1/num_inliers)
            w = edge_mask * np.asarray(num_inliers, np.float32)
            w = w / max(w.max(), 1e-9)

        valid = np.zeros(num_images, bool)
        np.logical_or.at(valid, edges[edge_mask][:, 0], True)
        np.logical_or.at(valid, edges[edge_mask][:, 1], True)

        anchor = int(np.argmax(valid))
        wRi0 = chordal_init(
            num_images, jnp.asarray(edges), jnp.asarray(i2Ri1, jnp.float32), jnp.asarray(w),
            anchor=anchor,
        )
        self.last_certified = None
        if self.options.staircase_p_max > 3:
            # descend the chordal cost to a critical point, certify global
            # optimality, and climb the SO(p) staircase if the certificate
            # fails (ShonanAveraging3 parity)
            wRi_st, certified, min_eig = shonan_staircase(
                num_images, edges, np.asarray(i2Ri1, np.float32), np.asarray(w),
                np.asarray(wRi0), p_max=self.options.staircase_p_max,
            )
            wRi0 = jnp.asarray(wRi_st)
            self.last_certified = (certified, min_eig)
        edges_j = jnp.asarray(edges)
        R_j = jnp.asarray(i2Ri1, jnp.float32)
        wRi = _refine(num_images, wRi0, edges_j, R_j, jnp.asarray(w), self.options)
        if self.options.rerefine_reject_deg > 0:
            # one jitted call, not an eager op chain: each eager dispatch
            # costs a remote-TPU tunnel round trip (~33 ms), and this runs
            # once per cluster node in the hierarchical pipeline
            res = _edge_residual_gathered(wRi, edges_j, R_j)
            ang = np.degrees(np.linalg.norm(np.asarray(res), axis=-1))
            w2 = w * (ang <= self.options.rerefine_reject_deg)
            if w2.sum() >= num_images - 1 and (w2 > 0).sum() < (w > 0).sum():
                wRi = _refine(num_images, wRi, edges_j, R_j, jnp.asarray(w2), self.options)
        wRi_np = np.array(wRi)
        wRi_np[~valid] = np.eye(3)
        return wRi_np, valid


def certify_rotation_solution(
    num_images: int,
    edges: np.ndarray,
    i2Ri1: np.ndarray,
    edge_weight: np.ndarray,
    wRi: np.ndarray,
    tol: float = 1e-6,
) -> tuple:
    """Global-optimality certificate for a rotation-averaging solution.

    Parity: ShonanAveraging's optimality certification (shonan.py:71 wraps
    GTSAM's checkOptimality). For the chordal cost sum_e w_e ||R_j - R_e
    R_i||_F^2 written as x^T Q x over stacked R^T blocks, a first-order
    critical point R* is globally optimal iff S = Lambda - Q is negative
    semidefinite... equivalently Q - Lambda >= 0 with
    Lambda_i = sym( sum_j Q_ij R_j R_i^T ) blocks evaluated at R*.
    Returns (certified: bool, min_eigenvalue: float) — min eig of
    (Q - Lambda) restricted appropriately; >= -tol certifies.
    """
    n = num_images
    i1 = edges[:, 0].astype(int)
    i2 = edges[:, 1].astype(int)
    w = np.asarray(edge_weight, np.float64)
    A = np.transpose(np.asarray(i2Ri1, np.float64), (0, 2, 1))  # i2Ri1^T per edge

    # Q blocks for cost sum_e w ||Y_i1 - A_e Y_i2||^2, Y_i = wRi^T
    Q = np.zeros((n, n, 3, 3))
    eye = np.eye(3)
    for e in range(len(edges)):
        a, b = i1[e], i2[e]
        Q[a, a] += w[e] * eye
        Q[b, b] += w[e] * eye
        Q[a, b] -= w[e] * A[e]
        Q[b, a] -= w[e] * A[e].T
    R = np.asarray(wRi, np.float64)
    Y = np.transpose(R, (0, 2, 1))  # wRi^T

    # Lambda_i = sym( sum_j Q_ij Y_j Y_i^T )
    Lam = np.zeros((n, 3, 3))
    for i in range(n):
        M = np.zeros((3, 3))
        for j in range(n):
            M += Q[i, j] @ Y[j] @ Y[i].T
        Lam[i] = 0.5 * (M + M.T)

    S = Q.copy()
    for i in range(n):
        S[i, i] -= Lam[i]
    Sd = S.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)
    vals = np.linalg.eigvalsh(Sd)
    min_eig = float(vals[0])
    return min_eig >= -tol * max(1.0, abs(vals[-1])), min_eig
