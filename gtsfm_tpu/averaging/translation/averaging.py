"""Global translation averaging with 1DSfM outlier rejection.

Parity: /root/reference/gtsfm/averaging/translation/averaging_1dsfm.py:79
(TranslationAveraging1DSFM: 1DSfM projection-based outlier rejection using
GTSAM's C++ MFAS, then TranslationRecovery with Huber noise; avg outlier
weight threshold 0.125; batched MFAS over <=2000 projection directions).

TPU-first split:
  * MFAS is an inherently sequential ordering heuristic -> host numpy
    (the reference keeps it in C++ for the same reason);
  * the solve is two fixed-iteration jit phases on device:
      1. LUD-style alternation: min sum w_e ||(t_i - t_j) - s_e u_e||^2
         with s_e >= 1 (linear Laplacian solve per iteration) — convex-ish
         init that fixes the scale gauge;
      2. Huber-IRLS Gauss-Newton on the direction residual
         normalize(t_i - t_j) - u_e (the TranslationRecovery cost).

Track-direction augmentation (camera->landmark directions,
averaging_1dsfm.py:333-400) plugs in as extra edges whose endpoint j
indexes a virtual "track node" — provided via run(..., extra_edges).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.utils.numerics import einsum as p_einsum, precise

# full reference budget (averaging_1dsfm.py:51); the multi-direction MFAS
# sweep runs in threaded C++ (native/mfas.cpp::mfas_outlier_weights), so
# 2000 directions cost ~a second even at skydio-501 edge counts
MAX_PROJECTION_DIRECTIONS = 2000
OUTLIER_WEIGHT_THRESHOLD = 0.125  # matches averaging_1dsfm.py:52


class TranslationAveragingOptions(NamedTuple):
    lud_iterations: int = 40
    refine_iterations: int = 30
    robust_huber: float = 0.1
    num_projection_dirs: int = MAX_PROJECTION_DIRECTIONS
    outlier_weight_threshold: float = OUTLIER_WEIGHT_THRESHOLD
    reject_outliers: bool = True
    # run MFAS over the combined camera+track direction graph (reference
    # parity: averaging_1dsfm.py:254-257 passes both dicts to MFAS)
    mfas_include_tracks: bool = True
    # uniform-density projection sampling at the full budget (reference
    # default: ProjectionSamplingMethod.SAMPLE_WITH_UNIFORM_DENSITY)
    mfas_uniform_sampling: bool = True


def mfas_outlier_weights(
    edges: np.ndarray, w_dirs: np.ndarray, num_nodes: int, proj_dirs: np.ndarray
) -> np.ndarray:
    """1DSfM outlier weights per edge, averaged over projection directions.

    edges: (E, 2) (i, j) meaning t_i - t_j ~ s * w_dirs[e].
    w_dirs: (E, 3) unit directions in world frame.
    proj_dirs: (P, 3) unit projection directions.
    Returns avg outlier weight in [0, 1] per edge.

    Host-side greedy MFAS (Eades et al. heuristic), mirroring gtsam.MFAS
    as used at averaging_1dsfm.py:216-296.
    """
    E = len(edges)
    if E == 0:
        return np.zeros(0, np.float32)

    lib = _native_mfas()
    if lib:
        import ctypes
        import os

        e2 = np.ascontiguousarray(np.asarray(edges, np.int64).reshape(-1))
        wd = np.ascontiguousarray(np.asarray(w_dirs, np.float64).reshape(-1))
        pd = np.ascontiguousarray(np.asarray(proj_dirs, np.float64).reshape(-1))
        out = np.empty(E, np.float64)
        n_threads = min(len(proj_dirs), os.cpu_count() or 1, 16)
        lib.mfas_outlier_weights(
            e2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            wd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(E), ctypes.c_int64(num_nodes),
            pd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(proj_dirs)), ctypes.c_int64(n_threads),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.astype(np.float32)

    broken = np.zeros(E, np.float64)
    total = np.zeros(E, np.float64)
    for d in proj_dirs:
        proj = w_dirs @ d  # (E,)
        # directed edge u -> v with weight |proj|: ordering position[u] < position[v]
        # t_i - t_j ~ s*dir, s>0: if proj>0 then t_i > t_j along d => j before i
        src = np.where(proj > 0, edges[:, 1], edges[:, 0])
        dst = np.where(proj > 0, edges[:, 0], edges[:, 1])
        wgt = np.abs(proj)
        order = _greedy_mfas_order(src, dst, wgt, num_nodes)
        pos = np.empty(num_nodes, np.int64)
        pos[order] = np.arange(num_nodes)
        violated = pos[src] > pos[dst]
        broken += np.where(violated, wgt, 0.0)
        total += wgt
    return (broken / np.maximum(total, 1e-12)).astype(np.float32)


_MFAS_LIB = None


def _native_mfas():
    global _MFAS_LIB
    if _MFAS_LIB is not None:
        return _MFAS_LIB
    import ctypes
    import os

    from gtsfm_tpu.native.build import ensure_built

    so = ensure_built("libmfas.so")
    if so is not None:
        lib = ctypes.CDLL(so)
        lib.mfas_order.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mfas_outlier_weights.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _MFAS_LIB = lib
    else:
        _MFAS_LIB = False
    return _MFAS_LIB


def _greedy_mfas_order(src, dst, wgt, n) -> np.ndarray:
    """Greedy minimum-feedback-arc-set ordering (host; C++ libmfas.so when
    built, mirroring the reference's native gtsam.MFAS, with a numpy
    fallback)."""
    import ctypes

    lib = _native_mfas()
    if lib:
        out = np.empty(n, np.int64)
        s = np.ascontiguousarray(src, np.int64)
        d = np.ascontiguousarray(dst, np.int64)
        w = np.ascontiguousarray(wgt, np.float64)
        lib.mfas_order(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(s)), ctypes.c_int64(n),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    # 1DSfM/gtsam ratio greedy — pick max (wout + eps)/(win + eps); sources
    # dominate, so a DAG sorts topologically (zero violations) — followed by
    # insertion-move local refinement (each node moved to its best position;
    # only crossings with its own neighbors matter). Mirrors
    # native/mfas.cpp::greedy_order + refine_order.
    eps = 1e-8
    win = np.zeros(n)
    wout = np.zeros(n)
    np.add.at(wout, src, wgt)
    np.add.at(win, dst, wgt)
    out_edges = [[] for _ in range(n)]
    in_edges = [[] for _ in range(n)]
    for e in range(len(src)):
        out_edges[src[e]].append((dst[e], wgt[e]))
        in_edges[dst[e]].append((src[e], wgt[e]))
    removed = np.zeros(n, bool)
    order = []
    for _ in range(n):
        ratio = np.where(removed, -np.inf, (wout + eps) / (win + eps))
        u = int(np.argmax(ratio))
        order.append(u)
        removed[u] = True
        for v, w in out_edges[u]:
            if not removed[v]:
                win[v] = max(win[v] - w, 0.0)
        for v, w in in_edges[u]:
            if not removed[v]:
                wout[v] = max(wout[v] - w, 0.0)

    # insertion refinement
    order = np.asarray(order, np.int64)
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n)
    order = list(order)
    for _ in range(8):
        improved = False
        for u in range(n):
            pu = int(pos[u])
            evs = [(int(pos[v]), -w) for v, w in out_edges[u]]
            evs += [(int(pos[v]), +w) for v, w in in_edges[u]]
            if not evs:
                continue
            evs.sort()
            best_gain, best_t = 0.0, pu
            g = 0.0
            for pv, dw in evs:
                if pv > pu:
                    g += dw
                    if g > best_gain + 1e-12:
                        best_gain, best_t = g, pv
            g = 0.0
            for pv, dw in reversed(evs):
                if pv < pu:
                    g -= dw
                    if g > best_gain + 1e-12:
                        best_gain, best_t = g, pv
            if best_t == pu:
                continue
            improved = True
            order.pop(pu)
            order.insert(best_t, u)
            lo, hi = (best_t, pu) if best_t < pu else (pu, best_t)
            for k in range(lo, hi + 1):
                pos[order[k]] = k
        if not improved:
            break
    return np.asarray(order, np.int64)


@partial(jax.jit, static_argnames=("num_nodes", "opts"))
@precise
def _solve_positions(
    num_nodes: int,
    edges: jnp.ndarray,  # i32[E, 2] (i, j): t_i - t_j + c_e ~ s_e u_e
    u: jnp.ndarray,  # f32[E, 3] unit world directions
    w: jnp.ndarray,  # f32[E] weights (0 = rejected)
    opts: TranslationAveragingOptions,
    c: jnp.ndarray | None = None,  # f32[E, 3] per-edge constant offsets
    t_init: jnp.ndarray | None = None,  # warm start: skip the LUD phase
):
    n = num_nodes
    i = edges[:, 0]
    j = edges[:, 1]
    if c is None:
        c = jnp.zeros_like(u)

    # --- phase 1: robust LUD alternation --------------------------------
    # min sum w_e rho(||t_i - t_j - s u||) given s: IRLS — each iteration
    # reweights edges by the Huber weight of its current DIRECTION residual
    # and solves the reweighted Laplacian. A non-robust init here lets a
    # handful of grossly-wrong two-view directions (low-parallax pairs can
    # be >90deg off; 4/66 measured on Door) drag the whole layout into a
    # basin the GN polish cannot leave — the reference never sees this
    # because GTSAM's TranslationRecovery is Huber-robust end to end
    # (averaging_1dsfm.py:56, HUBER_LOSS_K=1.3 on sigma=0.01 chordal).
    k_huber = opts.robust_huber

    def lud_step(t, _):
        d = t[i] - t[j] + c
        nrm = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
        rn = jnp.linalg.norm(d / nrm[:, None] - u, axis=-1)
        w_rob = (
            jnp.minimum(1.0, k_huber / jnp.maximum(rn, 1e-12))
            if k_huber > 0 else jnp.ones_like(rn)
        )
        we = w * w_rob
        L = jnp.zeros((n, n))
        L = L.at[i, i].add(we)
        L = L.at[j, j].add(we)
        L = L.at[i, j].add(-we)
        L = L.at[j, i].add(-we)
        L = L + 1e-6 * jnp.eye(n)
        L = L.at[0, 0].add(1e4)  # anchor node 0
        s = jnp.maximum(1.0, jnp.sum(d * u, axis=-1))
        rhs_e = s[:, None] * u - c  # target for t_i - t_j
        rhs = jnp.zeros((n, 3))
        rhs = rhs.at[i].add(we[:, None] * rhs_e)
        rhs = rhs.at[j].add(-we[:, None] * rhs_e)
        t_new = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(L), rhs)
        return t_new, None

    if t_init is None:
        t0 = jax.random.normal(jax.random.PRNGKey(0), (n, 3)) * 0.1
        t_lud, _ = jax.lax.scan(lud_step, t0, None, length=opts.lud_iterations)
    else:
        # the LUD phase's s >= 1 clamp re-normalizes the global scale; with
        # a metric warm start (rig path) go straight to the GN polish
        t_lud = t_init

    # --- phase 2: Huber-GN on direction residuals ----------------------
    def residuals(t):
        d = t[i] - t[j] + c
        nrm = jnp.linalg.norm(d, axis=-1)
        nrm_safe = jnp.maximum(nrm, 1e-9)
        return d / nrm_safe[:, None] - u, nrm

    def gn_step(carry, _):
        t, lam = carry
        r, nrm = residuals(t)

        def local_resid(dt_i, dt_j, t_):
            d = (t_[i] + dt_i) - (t_[j] + dt_j)
            n_ = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
            return d / n_[:, None] - u

        # Jacobian wrt endpoint perturbations: J = (I - dd^T)/||d|| with signs
        d = t[i] - t[j] + c
        nd = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        dn = d / nd
        P = (
            jnp.broadcast_to(jnp.eye(3), (d.shape[0], 3, 3))
            - dn[:, :, None] * dn[:, None, :]
        ) / nd[:, :, None]

        rn = jnp.linalg.norm(r, axis=-1)
        k = opts.robust_huber
        w_rob = jnp.minimum(1.0, k / jnp.maximum(rn, 1e-12)) if k > 0 else jnp.ones_like(rn)
        we = w * w_rob

        H = jnp.zeros((n, n, 3, 3))
        PtP = p_einsum("eri,erj->eij", P * we[:, None, None], P)
        H = H.at[i, i].add(PtP)
        H = H.at[j, j].add(PtP)
        H = H.at[i, j].add(-PtP)
        H = H.at[j, i].add(-PtP)
        g = jnp.zeros((n, 3))
        Ptr = p_einsum("eri,er->ei", P * we[:, None, None], r)
        g = g.at[i].add(Ptr)
        g = g.at[j].add(-Ptr)

        Hd = H.transpose(0, 2, 1, 3).reshape(3 * n, 3 * n)
        Hd = Hd + lam * jnp.diag(jnp.diag(Hd)) + (lam + 1e-6) * jnp.eye(3 * n)
        delta = jax.scipy.linalg.solve(Hd, -g.reshape(-1), assume_a="pos").reshape(n, 3)
        delta = delta.at[0].set(0.0)

        def cost_of(t_):
            r_, _ = residuals(t_)
            rn_ = jnp.linalg.norm(r_, axis=-1)
            rho = jnp.where(rn_ <= k, 0.5 * rn_**2, k * (rn_ - 0.5 * k)) if k > 0 else 0.5 * rn_**2
            return jnp.sum(w * rho)

        cand = t + delta
        accept = cost_of(cand) < cost_of(t)
        t_next = jnp.where(accept, cand, t)
        lam_next = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e6)
        return (t_next, lam_next), None

    (t_final, _), _ = jax.lax.scan(
        gn_step, (t_lud, jnp.asarray(1e-4)), None, length=opts.refine_iterations
    )
    return t_final


class TranslationAveraging:
    """1DSfM-style translation averaging.

    run(num_images, edges, i2Ui1, wRi, edge_mask) -> (wti [N,3], valid [N],
    inlier_edge_mask [E]). edges are (i1, i2); i2Ui1 is the unit translation
    direction of camera i1's center in camera i2's frame (the two-view
    estimator's convention, matching the reference).
    """

    def __init__(self, options: TranslationAveragingOptions = TranslationAveragingOptions()):
        self.options = options

    def run(
        self,
        num_images: int,
        edges: np.ndarray,
        i2Ui1: np.ndarray,
        wRi: np.ndarray,
        edge_mask: np.ndarray | None = None,
        seed: int = 0,
        track_dirs: tuple | None = None,
        rig_of: np.ndarray | None = None,
        rig_offsets: np.ndarray | None = None,
    ):
        """track_dirs: optional camera->landmark direction augmentation
        (cam_idx (A,), track_node (A,), w_dir (A, 3) world-frame unit
        directions) — the reference's BA-coverage track selection
        (averaging_1dsfm.py:333-400). Track nodes index a virtual node
        space appended after the camera nodes; their solved positions are
        discarded.

        rig_of / rig_offsets: HARD intra-rig constraints (parity:
        RigTranslationAveraging1DSFM, rig_1dsfm.py:25, which feeds GTSAM
        Constrained noise models). TPU-native formulation: constraints are
        eliminated exactly instead of penalized — cameras collapse onto
        their rig-body node (rig_of: i32[N] rig id per camera) with known
        world-frame center offsets (rig_offsets: f32[N, 3], i.e.
        wR_body @ body-frame camera center, computable once rotations are
        averaged). The solve runs over body positions with per-edge
        constant offsets in the direction residuals, then cameras are
        reconstituted as t_body[rig_of] + rig_offsets. Because offsets are
        metric, they also pin the global scale gauge."""
        edges = np.asarray(edges, np.int32)
        E = len(edges)
        if E == 0:
            return np.zeros((num_images, 3), np.float32), np.zeros(num_images, bool), np.zeros(0, bool)
        if edge_mask is None:
            edge_mask = np.ones(E, bool)
        # world direction from camera i2 toward camera i1:
        # t_{i1} - t_{i2} ~ s * (wRi2 @ i2Ui1)
        w_dirs = np.einsum("eij,ej->ei", wRi[edges[:, 1]], np.asarray(i2Ui1, np.float32))
        w_dirs /= np.maximum(np.linalg.norm(w_dirs, axis=-1, keepdims=True), 1e-12)

        inlier_mask = edge_mask.copy()
        if self.options.reject_outliers and E >= 3:
            rng = np.random.default_rng(seed)  # pinned seed (repro parity)
            mfas_edges = edges[edge_mask]
            mfas_dirs = w_dirs[edge_mask]
            mfas_nodes = num_images
            if self.options.mfas_include_tracks and track_dirs is not None:
                # reference parity (averaging_1dsfm.py:254-257): MFAS runs
                # over the COMBINED camera-camera + camera-track direction
                # graph. The track edges are a dense, mostly-consistent
                # scaffold that pins the 1D orderings; without them a
                # sparse camera graph leaves the ordering free to satisfy
                # grossly-wrong camera edges (measured on Door: three
                # ~120deg-wrong edges survive camera-only MFAS, one
                # survives the combined graph).
                tcam = np.asarray(track_dirs[0])
                tnode = np.asarray(track_dirs[1])
                tdir = np.asarray(track_dirs[2], np.float32)
                twt = (np.asarray(track_dirs[3], np.float32)
                       if len(track_dirs) == 4 else np.ones(len(tcam), np.float32))
                real = twt > 0  # drop static-shape padding entries
                if real.any():
                    # t_track - t_cam ~ s * dir  =>  edge (track, cam)
                    te = np.stack(
                        [tnode[real].astype(np.int64) + num_images,
                         tcam[real].astype(np.int64)], axis=-1,
                    )
                    mfas_edges = np.concatenate([mfas_edges.astype(np.int64), te])
                    mfas_dirs = np.concatenate([mfas_dirs, tdir[real]])
                    mfas_nodes = num_images + int(tnode[real].max()) + 1
            if self.options.mfas_uniform_sampling:
                # reference default: SAMPLE_WITH_UNIFORM_DENSITY at the
                # full budget (averaging_1dsfm.py:150-151) — the count does
                # NOT shrink with the edge count
                k = self.options.num_projection_dirs
                proj_dirs = rng.normal(size=(k, 3))
                proj_dirs /= np.linalg.norm(proj_dirs, axis=-1, keepdims=True)
            else:
                # legacy: half input measurements, half random
                k = min(self.options.num_projection_dirs, max(E, 8))
                pick = rng.choice(E, size=min(k // 2, E), replace=False)
                rand = rng.normal(size=(k - len(pick), 3))
                rand /= np.linalg.norm(rand, axis=-1, keepdims=True)
                proj_dirs = np.concatenate([w_dirs[pick], rand], axis=0)
            ow = mfas_outlier_weights(mfas_edges, mfas_dirs, mfas_nodes, proj_dirs)
            keep = ow[: int(edge_mask.sum())] <= self.options.outlier_weight_threshold
            inlier_mask[np.nonzero(edge_mask)[0][~keep]] = False

        valid = np.zeros(num_images, bool)
        np.logical_or.at(valid, edges[inlier_mask][:, 0], True)
        np.logical_or.at(valid, edges[inlier_mask][:, 1], True)

        # solve on device: edge (i1, i2) with t_i1 - t_i2 ~ s * w_dir
        w = inlier_mask.astype(np.float32)
        if rig_of is not None:
            rig_of = np.asarray(rig_of, np.int64)
            rig_offsets = np.asarray(rig_offsets, np.float32).reshape(num_images, 3)
            n_body = int(rig_of.max()) + 1 if num_images else 0
            node_of = rig_of.astype(np.int32)
        else:
            n_body = num_images
            node_of = np.arange(num_images, dtype=np.int32)
            rig_offsets = np.zeros((num_images, 3), np.float32)

        solve_edges = node_of[edges]
        # residual d = t[i] - t[j] + (off_i1 - off_i2)
        solve_c = rig_offsets[edges[:, 0]] - rig_offsets[edges[:, 1]]
        # intra-rig edges carry no information about body positions
        w = w * (solve_edges[:, 0] != solve_edges[:, 1])
        solve_dirs = w_dirs
        solve_w = w
        num_nodes = n_body
        if track_dirs is not None:
            # 3-tuple (cam_idx, track_node, dirs) or 4-tuple with an extra
            # per-direction weight (0 = padding entry, kept for static shapes)
            if len(track_dirs) == 4:
                cam_idx, track_node, tdirs, tw = track_dirs
                tw = 0.5 * np.asarray(tw, np.float32)
            else:
                cam_idx, track_node, tdirs = track_dirs
                tw = 0.5 * np.ones(len(np.asarray(cam_idx)), np.float32)
            num_nodes = n_body + (int(np.max(track_node)) + 1 if len(track_node) else 0)
            # direction from camera -> track: t_track - t_cam ~ s * dir
            aug_edges = np.stack(
                [np.asarray(track_node) + n_body, node_of[np.asarray(cam_idx)]], axis=-1
            ).astype(np.int32)
            aug_c = -rig_offsets[np.asarray(cam_idx)]
            solve_edges = np.concatenate([solve_edges, aug_edges])
            solve_c = np.concatenate([solve_c, aug_c])
            solve_dirs = np.concatenate([w_dirs, np.asarray(tdirs, np.float32)])
            solve_w = np.concatenate([w, tw])
        se = jnp.asarray(solve_edges.astype(np.int32))
        sd = jnp.asarray(solve_dirs)
        sw = jnp.asarray(solve_w)
        if rig_of is not None:
            # 1) direction-only solve (scale-free) over body nodes
            t_hat = np.asarray(_solve_positions(num_nodes, se, sd, sw, self.options))
            # 2) closed-form metric scale from the rig offsets: each edge
            # wants a*dt + c parallel to u, i.e. a*(dt x u) = -(c x u)
            dt = t_hat[solve_edges[:, 0]] - t_hat[solve_edges[:, 1]]
            v = np.cross(dt, solve_dirs)
            z = np.cross(solve_c, solve_dirs)
            ww = solve_w[:, None]
            denom = float(np.sum(ww * v * v))
            a = -float(np.sum(ww * v * z)) / max(denom, 1e-12)
            a = abs(a) if abs(a) > 1e-6 else 1.0
            # 3) GN polish with the offsets, warm-started at metric scale
            t = _solve_positions(
                num_nodes, se, sd, sw, self.options,
                c=jnp.asarray(solve_c), t_init=jnp.asarray(a * t_hat),
            )
        else:
            t = _solve_positions(num_nodes, se, sd, sw, self.options,
                                 c=jnp.asarray(solve_c))
        t_np = np.array(t)[node_of] + rig_offsets
        t_np[~valid] = 0.0
        return t_np.astype(np.float32), valid, inlier_mask


def select_tracks_for_coverage(
    track_cam: "np.ndarray", track_mask: "np.ndarray", num_images: int,
    tracks_per_camera: int = 12,
) -> "np.ndarray":
    """Greedy per-camera track selection for translation-averaging coverage.

    Parity: averaging_1dsfm.py:333-400 (12 tracks/camera greedy cover).
    Returns selected track indices."""
    counts = np.zeros(num_images, np.int64)
    lengths = track_mask.sum(axis=1)
    order = np.argsort(-lengths)
    selected = []
    for t in order:
        cams = track_cam[t][track_mask[t]]
        if len(cams) < 2:
            continue
        if np.any(counts[cams] < tracks_per_camera):
            selected.append(t)
            counts[cams] += 1
        if np.all(counts >= tracks_per_camera):
            break
    return np.asarray(selected, np.int64)


def camera_track_directions(
    wRi: "np.ndarray", cal, track_cam, track_uv, track_mask, selected
):
    """Unit world directions camera -> track landmark from the bearing of
    each selected track observation. Returns (cam_idx, track_node, dirs).

    Fully batched: one calibrate over every selected observation and one
    rotation einsum (the per-observation python loop issued thousands of
    tiny device calls and dominated wall-clock at 500-camera scale)."""
    import jax
    import jax.numpy as jnp

    selected = np.asarray(selected, np.int64)
    if len(selected) == 0:
        return (
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros((0, 3), np.float32),
        )
    sel_cam = np.asarray(track_cam)[selected]  # (S, L)
    sel_uv = np.asarray(track_uv)[selected]  # (S, L, 2)
    sel_m = np.asarray(track_mask)[selected]  # (S, L)
    S, L = sel_cam.shape
    flat_cam = sel_cam.reshape(-1).astype(np.int64)
    cal_g = jax.tree.map(lambda a: jnp.asarray(a)[flat_cam], cal)
    xy = np.asarray(cal_g.calibrate(jnp.asarray(sel_uv.reshape(-1, 2), jnp.float32)))
    bearing = np.concatenate(
        [xy.astype(np.float64), np.ones((len(xy), 1))], axis=-1
    )
    bearing /= np.linalg.norm(bearing, axis=-1, keepdims=True)
    d = np.einsum("mij,mj->mi", np.asarray(wRi, np.float64)[flat_cam], bearing)
    keep = sel_m.reshape(-1)
    nodes = np.repeat(np.arange(S, dtype=np.int32), L)
    return (
        flat_cam[keep].astype(np.int32),
        nodes[keep],
        d[keep].astype(np.float32),
    )
