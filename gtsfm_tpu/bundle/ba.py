"""Bundle adjustment: Levenberg-Marquardt with a matrix-free Schur complement.

Parity: /root/reference/gtsfm/bundle/bundle_adjustment.py:54
(BundleAdjustmentOptimizer over GTSAM GeneralSFMFactor2 + LM with METIS
ordering, robust Huber noise, staged optimize+filter).

TPU-first re-design. GTSAM eliminates a sparse factor graph with a fill-
reducing ordering on the CPU; the natural TPU formulation is instead:

  * the problem is a fixed-shape padded measurement list (meas_cam,
    meas_track, meas_uv, meas_mask) — exactly SfmData's layout;
  * per-measurement 2-row Jacobian blocks J_c (pose+calib) and J_p (point)
    come from vmapped forward-mode autodiff of the projection;
  * the damped normal equations are reduced onto cameras by the Schur
    complement S = H_cc + lam*D - W Hpp^-1 W^T, and S is never formed:
    PCG runs with an O(M) segment-sum matvec and a block-Jacobi
    preconditioner — all dense, static-shape, fully on-device;
  * robustness = IRLS Huber weights recomputed each outer iteration
    (GNC-style graduated scaling optional);
  * gauge freedom is handled by damping plus optional frozen cameras.

The entire optimize() is one jit-compiled lax.scan — no host round-trips
inside the solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from gtsfm_tpu.common.sfm_data import SfmData
from gtsfm_tpu.geometry import SE3, PinholeCamera
from gtsfm_tpu.utils.numerics import einsum as p_einsum, precise


def _tiny_einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """einsum for contractions over TINY dims (2-6) with big trailing batch
    axes, unrolled to pure (batch,)-lane arithmetic on TPU.

    On TPU, jnp.einsum at default precision may lower these to MXU
    dot_generals whose bf16 input rounding corrupts the LM linearization
    (and whose 128-wide tile padding wastes the MXU); the unrolled form is
    exact f32 on the VPU. On CPU the stock einsum is kept BIT-IDENTICAL —
    downstream RANSAC/BA accuracy baselines are chaotic to float-stream
    changes (see docs/DESIGN.md round-3 notes).

    Grammar: indices appearing in both inputs and the output are batch
    (elementwise, must be the trailing axes of all operands in the same
    order); in both inputs only = contracted; in one input + output =
    free. All non-batch dims must be small and leading."""
    if jax.default_backend() != "tpu":
        return jnp.einsum(spec, a, b)
    return _tiny_einsum_unrolled(spec, a, b)


def _tiny_einsum_unrolled(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ins, out = spec.split("->")
    sa, sb = ins.split(",")
    batch = [c for c in sa if c in sb and c in out]
    small_a = [c for c in sa if c not in batch]
    small_b = [c for c in sb if c not in batch]
    assert sa.endswith("".join(batch)) and sb.endswith("".join(batch)) and out.endswith(
        "".join(batch)
    ), f"_tiny_einsum: batch axes must trail identically in {spec}"
    dims = {}
    for c, n in list(zip(sa, a.shape)) + list(zip(sb, b.shape)):
        dims[c] = n
    contract = [c for c in small_a if c in small_b]
    free_out = [c for c in out if c not in batch]

    def slice_op(arr, idx_map, small):
        sl = tuple(idx_map[c] for c in small)
        return arr[sl]  # leading small dims indexed; batch dims remain

    def build(prefix):
        if len(prefix) == len(free_out):
            idx = dict(prefix)
            total = None
            for cvals in _iter_dims(contract, dims):
                idx_all = {**idx, **cvals}
                term = slice_op(a, idx_all, small_a) * slice_op(b, idx_all, small_b)
                total = term if total is None else total + term
            return total
        c = free_out[len(prefix)]
        return jnp.stack(
            [build(prefix + [(c, i)]) for i in range(dims[c])], axis=0
        )

    return build([])


def _iter_dims(chars, dims):
    if not chars:
        yield {}
        return
    c, rest = chars[0], chars[1:]
    for i in range(dims[c]):
        for tail in _iter_dims(rest, dims):
            yield {c: i, **tail}


class BAOptions(NamedTuple):
    max_iterations: int = 30
    cg_iterations: int = 40
    robust_huber_px: float = 1.345  # Huber threshold in pixels (0 = disabled)
    # "huber" = IRLS Huber; "gnc_gm" = graduated non-convexity with the
    # Geman-McClure loss (parity: GncLMOptimizer, bundle_adjustment.py:359-372)
    robust_mode: str = "huber"
    gnc_mu_init: float = 64.0
    gnc_gamma: float = 0.5  # mu <- mu * gamma each outer iteration, floor 1
    # after a GNC solve, drop measurements whose final robust factor weight
    # falls below this, then drop tracks shorter than min_track_length
    # (parity: __filter_tracks_by_factor_weights, bundle_adjustment.py:433-486
    # gated by factor_weight_outlier_threshold, default 0 = off)
    gnc_weight_threshold: float = 0.0
    min_track_length: int = 2
    optimize_intrinsics: bool = False
    # project per-camera intrinsics deltas onto their mean each step
    # (block-Jacobi treatment of the shared-calibration variable; parity:
    # shared calibration mode, bundle_adjustment.py:33-35)
    shared_intrinsics: bool = False
    # absolute pose priors: soft SE3 priors with scalar weight (parity:
    # pose priors, bundle_adjustment.py:218-254)
    pose_prior_weight: float = 0.0
    # soft prior pulling optimized intrinsics toward their initial values
    # (parity: calibration priors, bundle_adjustment.py:256-295)
    cal_prior_weight: float = 0.0
    # anchor the best-constrained 3D point at its initial value to pin the
    # scale gauge (parity: first-point scale prior, bundle_adjustment.py:
    # 317-320)
    first_point_prior_weight: float = 0.0
    # gauge handling: "fixed" = freeze fixed_cam cameras; "karcher" = a
    # residual anchoring the MEAN rotation of the free cameras at its
    # initial value (parity: GTSAM KarcherMeanFactor gauge,
    # bundle_adjustment.py:218-254); translation/scale gauge comes from
    # pose / first-point priors as in the reference
    gauge: str = "fixed"
    karcher_weight: float = 1e4
    init_lambda: float = 1e-4
    min_lambda: float = 1e-10
    max_lambda: float = 1e8
    lambda_down: float = 0.5
    lambda_up: float = 4.0
    # measurement noise sigma in pixels (scales the cost like the reference's
    # measurement_noise_sigma, bundle_adjustment.py:45-52)
    measurement_sigma_px: float = 1.0
    # inner-solve data layout. "dense" pads measurements track-major to
    # (T, L) and forms the reduced camera system S (N*d, N*d) explicitly
    # with batched MXU matmuls + one Cholesky solve per LM step — the
    # TPU-native DENSE_SCHUR; requires the track-grouped layout that
    # BundleAdjustment.run builds (densify_problem) and N*d small enough
    # to factor (fine to ~1-2k cameras, the hierarchical cluster regime).
    # "entry" stores per-measurement quantities entry-major — tiny (d, 3)
    # blocks unstacked so the M axis rides the 128-lane dim, segment
    # reductions become lane-cumsum + boundary diffs, and camera
    # gathers/scatters become one-hot matmuls (ITERATIVE_SCHUR analog for
    # huge N). "scatter" is the row-major segment_sum formulation —
    # required when the measurement axis is sharded over a mesh.
    layout: str = "entry"
    # measurements-per-track padding of the "dense" layout; 0 = derive
    # from the data (next power of two >= max track length)
    dense_track_len: int = 0


@struct.dataclass
class BAProblem:
    """Static-shape BA problem extracted from SfmData."""

    poses: SE3  # [N]
    cal: object  # full batched calibration [N] (keeps non-optimized fields)
    cal_params: jnp.ndarray  # [N, dc] the optimizable calibration vector
    points: jnp.ndarray  # [T, 3]
    meas_cam: jnp.ndarray  # i32[M]
    meas_track: jnp.ndarray  # i32[M]
    meas_uv: jnp.ndarray  # f32[M, 2]
    meas_w: jnp.ndarray  # f32[M] base weights (0 = padding/invalid)
    fixed_cam: jnp.ndarray  # bool[N] cameras frozen in place
    # relative-pose (BetweenFactor) priors, e.g. camera-rig constraints
    # (parity: bundle_adjustment.py:197-216, rig_bundle_adjustment.py:25):
    # for edge f: residual = w * Log(meas_bTa^-1 * (wTb^-1 wTa))
    rel_edges: jnp.ndarray  # i32[F, 2] (a, b); F >= 1 (padded, weight 0)
    rel_meas: SE3  # [F] measured bTa
    rel_weight: jnp.ndarray  # f32[F]
    # absolute pose priors (soft): residual = w * Log(prior^-1 wTi)
    prior_pose: SE3  # [N]
    prior_weight: jnp.ndarray  # f32[N] (0 = no prior)


def problem_from_sfm_data(
    data: SfmData,
    fixed_cam=None,
    rel_edges=None,
    rel_meas: SE3 | None = None,
    rel_weight=None,
    prior_pose: SE3 | None = None,
    prior_weight=None,
) -> BAProblem:
    n = data.max_cameras
    if fixed_cam is None:
        fixed_cam = jnp.zeros(n, bool)
    base_w = (
        data.meas_mask
        & data.track_mask[data.meas_track]
        & data.pose_mask[data.meas_cam]
    ).astype(jnp.float32)
    if rel_edges is None:
        rel_edges = jnp.zeros((1, 2), jnp.int32)
        rel_meas = SE3.identity((1,))
        rel_weight = jnp.zeros(1)
    if prior_pose is None:
        prior_pose = data.poses
        prior_weight = jnp.zeros(n)
    return BAProblem(
        poses=data.poses,
        cal=data.cal,
        cal_params=data.cal.to_params(),
        points=data.points,
        meas_cam=data.meas_cam,
        meas_track=data.meas_track,
        meas_uv=data.meas_uv,
        meas_w=base_w,
        fixed_cam=fixed_cam,
        rel_edges=jnp.asarray(rel_edges, jnp.int32),
        rel_meas=rel_meas,
        rel_weight=jnp.asarray(rel_weight, jnp.float32),
        prior_pose=prior_pose,
        prior_weight=jnp.asarray(prior_weight, jnp.float32),
    )


def problem_to_sfm_data(prob: BAProblem, data: SfmData) -> SfmData:
    return data.replace(
        poses=prob.poses,
        cal=prob.cal.with_params(prob.cal_params),
        points=prob.points,
    )


def _residuals(prob: BAProblem) -> tuple:
    """Per-measurement residual (M, 2) and depth (M,)."""
    poses_m = jax.tree.map(lambda a: a[prob.meas_cam], prob.poses)
    cal_m = jax.tree.map(lambda a: a[prob.meas_cam], prob.cal)
    calp_m = prob.cal_params[prob.meas_cam]
    X_m = prob.points[prob.meas_track]
    cam = PinholeCamera(pose=poses_m, cal=cal_m.with_params(calp_m))
    uv_hat, depth = cam.project(X_m)
    return uv_hat - prob.meas_uv, depth


def _robust_weights(r, depth, base_w, opts: "BAOptions", mu):
    """IRLS robust weights on the 2D residual norm; behind-camera => 0.

    huber: w = min(1, k/|r|);  gnc_gm (Geman-McClure under GNC): the
    graduated weight (mu c^2 / (r^2 + mu c^2))^2 with mu annealed toward 1.
    """
    nrm = jnp.linalg.norm(r, axis=-1)
    w_rob = _robust_w_from_nrm(nrm, opts, mu)
    return base_w * w_rob * (depth > 1e-6) / (opts.measurement_sigma_px**2)


def _robust_w_from_nrm(nrm, opts: "BAOptions", mu):
    k = opts.robust_huber_px
    if opts.robust_mode == "gnc_gm" and k > 0:
        c2 = k * k
        return (mu * c2 / (nrm**2 + mu * c2)) ** 2
    if k > 0:
        return jnp.minimum(1.0, k / jnp.maximum(nrm, 1e-12))
    return jnp.ones_like(nrm)


def _jacobians(prob: BAProblem, optimize_intrinsics: bool):
    """Vmapped per-measurement Jacobians.

    Returns J_c (M, 2, dcam), J_p (M, 2, 3) where dcam = 6 (+dc if
    optimizing intrinsics), evaluated at the current state via retraction.
    """
    dc = prob.cal_params.shape[-1]

    def resid_local(xi, dcal, dX, pose, cal1, calp, X, uv):
        cam = PinholeCamera(
            pose=pose.retract(xi), cal=cal1.with_params(calp + dcal)
        )
        uv_hat, _ = cam.project(X + dX)
        return uv_hat - uv

    poses_m = jax.tree.map(lambda a: a[prob.meas_cam], prob.poses)
    cal_m = jax.tree.map(lambda a: a[prob.meas_cam], prob.cal)
    calp_m = prob.cal_params[prob.meas_cam]
    X_m = prob.points[prob.meas_track]

    zeros6 = jnp.zeros(6, prob.points.dtype)
    zerosc = jnp.zeros(dc, prob.points.dtype)
    zeros3 = jnp.zeros(3, prob.points.dtype)

    jac = jax.vmap(
        jax.jacfwd(resid_local, argnums=(0, 1, 2)),
        in_axes=(None, None, None, 0, 0, 0, 0, 0),
    )
    J_pose, J_cal, J_pt = jac(zeros6, zerosc, zeros3, poses_m, cal_m, calp_m, X_m, prob.meas_uv)
    if optimize_intrinsics:
        J_c = jnp.concatenate([J_pose, J_cal], axis=-1)  # (M, 2, 6+dc)
    else:
        J_c = J_pose  # (M, 2, 6)
    return J_c, J_pt


def _pose_prior_terms(prob: BAProblem, d: int):
    """Gauss-Newton contributions of relative + absolute pose priors.

    Returns (H_diag [N, d, d], g [N, d], rel blocks for the matvec:
    (edges, Jab [F, 6, 6] cross term J_a^T W J_b, J_a/J_b diag parts
    already folded into H_diag)).
    """
    n = prob.fixed_cam.shape[0]
    z6 = jnp.zeros(6)

    # --- relative (between) factors ---------------------------------
    a_idx = prob.rel_edges[:, 0]
    b_idx = prob.rel_edges[:, 1]
    pa = jax.tree.map(lambda x: x[a_idx], prob.poses)
    pb = jax.tree.map(lambda x: x[b_idx], prob.poses)

    def rel_resid(xa, xb, Ta, Tb, Tm):
        rel = Tb.retract(xb).inverse().compose(Ta.retract(xa))
        return Tm.inverse().compose(rel).log()

    r_rel = jax.vmap(rel_resid, in_axes=(None, None, 0, 0, 0))(
        z6, z6, pa, pb, prob.rel_meas
    )  # (F, 6)
    Ja, Jb = jax.vmap(
        jax.jacfwd(rel_resid, argnums=(0, 1)), in_axes=(None, None, 0, 0, 0)
    )(z6, z6, pa, pb, prob.rel_meas)  # (F, 6, 6)
    wf = prob.rel_weight[:, None, None]
    Haa = p_einsum("fri,frj->fij", Ja * wf, Ja)
    Hbb = p_einsum("fri,frj->fij", Jb * wf, Jb)
    Hab = p_einsum("fri,frj->fij", Ja * wf, Jb)
    ga = p_einsum("fri,fr->fi", Ja * wf, r_rel)
    gb = p_einsum("fri,fr->fi", Jb * wf, r_rel)

    H_diag6 = jnp.zeros((n, 6, 6))
    H_diag6 = H_diag6.at[a_idx].add(Haa).at[b_idx].add(Hbb)
    g6 = jnp.zeros((n, 6))
    g6 = g6.at[a_idx].add(ga).at[b_idx].add(gb)

    # --- absolute priors --------------------------------------------
    def abs_resid(xi, T, Tp):
        return Tp.inverse().compose(T.retract(xi)).log()

    r_abs = jax.vmap(abs_resid, in_axes=(None, 0, 0))(z6, prob.poses, prob.prior_pose)
    J_abs = jax.vmap(jax.jacfwd(abs_resid, argnums=0), in_axes=(None, 0, 0))(
        z6, prob.poses, prob.prior_pose
    )  # (N, 6, 6)
    wp = prob.prior_weight[:, None, None]
    H_diag6 = H_diag6 + p_einsum("nri,nrj->nij", J_abs * wp, J_abs)
    g6 = g6 + p_einsum("nri,nr->ni", J_abs * wp, r_abs)

    # lift 6-dof blocks into the d-dof camera parameterization
    H_diag = jnp.zeros((n, d, d)).at[:, :6, :6].add(H_diag6)
    g = jnp.zeros((n, d)).at[:, :6].add(g6)
    return H_diag, g, (a_idx, b_idx, Hab)


def _prior_cost(prob: BAProblem) -> jnp.ndarray:
    a_idx = prob.rel_edges[:, 0]
    b_idx = prob.rel_edges[:, 1]
    pa = jax.tree.map(lambda x: x[a_idx], prob.poses)
    pb = jax.tree.map(lambda x: x[b_idx], prob.poses)
    rel = pb.inverse().compose(pa)
    r_rel = prob.rel_meas.inverse().compose(rel).log()
    c = 0.5 * jnp.sum(prob.rel_weight * jnp.sum(r_rel**2, axis=-1))
    r_abs = prob.prior_pose.inverse().compose(prob.poses).log()
    c = c + 0.5 * jnp.sum(prob.prior_weight * jnp.sum(r_abs**2, axis=-1))
    return c


def _schur_solve(J_c, J_p, r, w, meas_cam, meas_track, n_cam, n_track, fixed_cam, lam, cg_iters,
                 prior_terms=None, shared_cal_dims: int = 0, point_prior=None,
                 karcher=None):
    """Solve the damped normal equations via Schur + PCG.

    Returns (delta_c [N, d], delta_p [T, 3]).

    shared_cal_dims > 0 solves the SHARED-calibration system exactly: the
    trailing `dc` columns of every camera block are one global variable
    (parity: GTSAM's single shared-calib key, bundle_adjustment.py:33-35).
    The reduced operator is A^T S A where A replicates the shared delta to
    every camera — CG runs on (N*6 + dc) unknowns, so pose-cal coupling is
    exact rather than a post-step projection.
    """
    d = J_c.shape[-1]
    dc = shared_cal_dims
    sw = jnp.sqrt(w)[:, None, None]
    Jc = J_c * sw
    Jp = J_p * sw
    rw = r * jnp.sqrt(w)[:, None]

    # frozen cameras: zero their jacobian columns (pose only when the
    # calibration is shared — a frozen pose still constrains the shared K)
    free = (~fixed_cam).astype(Jc.dtype)[meas_cam][:, None, None]
    if dc > 0:
        Jc = jnp.concatenate([Jc[..., : d - dc] * free, Jc[..., d - dc :]], axis=-1)
    else:
        Jc = Jc * free

    # block diagonals and gradients
    Hcc = jax.ops.segment_sum(p_einsum("mri,mrj->mij", Jc, Jc), meas_cam, num_segments=n_cam)
    Hpp = jax.ops.segment_sum(p_einsum("mri,mrj->mij", Jp, Jp), meas_track, num_segments=n_track)
    g_c = jax.ops.segment_sum(p_einsum("mri,mr->mi", Jc, rw), meas_cam, num_segments=n_cam)
    g_p = jax.ops.segment_sum(p_einsum("mri,mr->mi", Jp, rw), meas_track, num_segments=n_track)

    rel_coupling = None
    if prior_terms is not None:
        H_prior, g_prior, rel_coupling = prior_terms
        freeN = (~fixed_cam).astype(Jc.dtype)[:, None]
        Hcc = Hcc + H_prior * freeN[..., None] * freeN[:, None, :]
        g_c = g_c + g_prior * freeN

    eye_d = jnp.eye(d, dtype=Jc.dtype)
    eye_3 = jnp.eye(3, dtype=Jc.dtype)
    # Marquardt damping: lam * (diag + eps*I) keeps fixed/empty blocks SPD
    Hcc_d = Hcc + lam * (jnp.abs(Hcc) * eye_d) + (lam + 1e-8) * eye_d
    Hpp_d = Hpp + lam * (jnp.abs(Hpp) * eye_3) + (lam + 1e-8) * eye_3
    if point_prior is not None:
        # scale-gauge anchor on one well-constrained point
        pp_idx, pp_w2, pp_res = point_prior
        Hpp_d = Hpp_d.at[pp_idx].add(pp_w2 * eye_3)
        g_p = g_p.at[pp_idx].add(pp_res)
    Hpp_inv = jnp.linalg.inv(Hpp_d)

    # per-measurement W block: W_m = Jc_m^T Jp_m (d, 3)
    W = p_einsum("mri,mrj->mij", Jc, Jp)

    # Karcher gauge residual r = w * mean_i log(R_i R0_i^T) over the free
    # cameras (KarcherMeanFactor parity): rank-3 PSD coupling in the
    # operator (one broadcast per matvec) + its gradient on the RHS
    freeN_g = (~fixed_cam).astype(Jc.dtype)[:, None]
    n_free_g = jnp.maximum(jnp.sum(freeN_g), 1.0)
    if karcher is not None:
        # right-retraction: d log(R_i Exp(w) R0_i^T)/dw = R0_i, so the
        # per-camera Jacobian of the mean-rotation residual is R0_i / N
        k_w2, mean_dev, R0g = karcher
        g_kar = p_einsum("nji,j->ni", R0g, mean_dev)  # R0^T dev per camera
        g_c = g_c.at[:, :3].add((k_w2 / n_free_g) * g_kar * freeN_g)

    def S_matvec(x):  # x: [N, d]
        y1 = p_einsum("nij,nj->ni", Hcc_d, x)
        if karcher is not None:
            rx = p_einsum("nij,nj->ni", R0g, x[:, :3]) * freeN_g
            mean3 = jnp.sum(rx, axis=0) / n_free_g
            back = p_einsum("nji,j->ni", R0g, mean3)
            y1 = y1.at[:, :3].add((k_w2 / n_free_g) * back * freeN_g)
        u = p_einsum("mij,mi->mj", W, x[meas_cam])  # (M, 3) = W^T x
        s = jax.ops.segment_sum(u, meas_track, num_segments=n_track)
        v = p_einsum("tij,tj->ti", Hpp_inv, s)
        t = p_einsum("mij,mj->mi", W, v[meas_track])  # (M, d) = W v
        y2 = jax.ops.segment_sum(t, meas_cam, num_segments=n_cam)
        y = y1 - y2
        if rel_coupling is not None:
            # off-diagonal camera-camera coupling from between-factors
            a_idx, b_idx, Hab = rel_coupling
            freeN = (~fixed_cam).astype(x.dtype)[:, None]
            xa = (x * freeN)[a_idx][:, :6]
            xb = (x * freeN)[b_idx][:, :6]
            ya = p_einsum("fij,fj->fi", Hab, xb)  # H_ab x_b -> a
            yb = p_einsum("fji,fj->fi", Hab, xa)  # H_ab^T x_a -> b
            y6 = jnp.zeros((n_cam, 6)).at[a_idx].add(ya).at[b_idx].add(yb)
            y = y.at[:, :6].add(y6 * freeN[:, :1])
        return y

    # rhs: b = -g_c + W Hpp^-1 g_p
    hv = p_einsum("tij,tj->ti", Hpp_inv, g_p)
    b = -g_c + jax.ops.segment_sum(
        p_einsum("mij,mj->mi", W, hv[meas_track]), meas_cam, num_segments=n_cam
    )

    if dc > 0:
        # ---- shared-calibration reduced space: x~ = (N*6 pose | dc cal) --
        dp = d - dc

        def expand(xt):  # (N*dp + dc,) -> (N, d)
            xp = xt[: n_cam * dp].reshape(n_cam, dp)
            y = xt[n_cam * dp :]
            return jnp.concatenate(
                [xp, jnp.broadcast_to(y[None], (n_cam, dc))], axis=-1
            )

        def reduce_(z):  # (N, d) -> (N*dp + dc,)
            return jnp.concatenate([z[:, :dp].reshape(-1), jnp.sum(z[:, dp:], axis=0)])

        op = lambda xt: reduce_(S_matvec(expand(xt)))
        bt = reduce_(b)
        # preconditioner: per-camera pose blocks + the pooled cal block
        Mp_inv = jnp.linalg.inv(Hcc_d[:, :dp, :dp])
        Mc_inv = jnp.linalg.inv(jnp.sum(Hcc_d[:, dp:, dp:], axis=0))

        def precond_t(xt):
            xp = xt[: n_cam * dp].reshape(n_cam, dp)
            y = xt[n_cam * dp :]
            return jnp.concatenate(
                [p_einsum("nij,nj->ni", Mp_inv, xp).reshape(-1), Mc_inv @ y]
            )

        def cg_body_t(_, carry):
            x, rr, p, rz = carry
            Ap = op(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond_t(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return x, rr, p, rz_new

        z0 = precond_t(bt)
        init = (jnp.zeros_like(bt), bt, z0, jnp.sum(bt * z0))
        xt, *_ = jax.lax.fori_loop(0, cg_iters, cg_body_t, init)
        delta_c = expand(xt)
    else:
        # block-Jacobi preconditioner from Hcc_d
        M_inv = jnp.linalg.inv(Hcc_d)
        precond = lambda x: p_einsum("nij,nj->ni", M_inv, x)

        def cg_body(_, carry):
            x, rr, p, rz = carry
            Ap = S_matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return x, rr, p, rz_new

        x0 = jnp.zeros_like(b)
        z0 = precond(b)
        init = (x0, b, z0, jnp.sum(b * z0))
        delta_c, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, init)

    # back-substitute points: delta_p = -Hpp^-1 (g_p + W^T delta_c)
    u = p_einsum("mij,mi->mj", W, delta_c[meas_cam])
    s = jax.ops.segment_sum(u, meas_track, num_segments=n_track)
    delta_p = -p_einsum("tij,tj->ti", Hpp_inv, g_p + s)
    return delta_c, delta_p


def _segsum_lanes(u: jnp.ndarray, st: jnp.ndarray, en: jnp.ndarray) -> jnp.ndarray:
    """Segment sum over the minor (lane) axis of `u` (..., M) for segments
    stored contiguously: exclusive cumsum + boundary difference. st/en are
    (T,) start/end offsets per segment (st==en -> zero sum)."""
    c = jnp.cumsum(u, axis=-1)
    c = jnp.concatenate([jnp.zeros(u.shape[:-1] + (1,), u.dtype), c], axis=-1)
    return c[..., en] - c[..., st]


def _inv3_lanes(H: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (3, 3, T) lane-batched SPD blocks (adjugate /
    determinant) — every entry is a (T,) lane vector, no (T,3,3) relayout."""
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 0], H[1, 1], H[1, 2]
    g, h, i = H[2, 0], H[2, 1], H[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hc = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.stack([
        jnp.stack([A, B, C]),
        jnp.stack([D, E, F]),
        jnp.stack([G, Hc, I]),
    ]) * inv_det


def _schur_solve_entry(J_c, J_p, r, w, meas_cam, meas_track, trk_st, trk_en,
                       n_cam, n_track, fixed_cam, lam, cg_iters,
                       prior_terms=None, shared_cal_dims: int = 0,
                       point_prior=None, karcher=None):
    """Entry-major Schur + PCG solve (measurements pre-sorted by track).

    Identical math to _schur_solve, restructured for the TPU memory system:
    per-measurement (2, d) / (2, 3) Jacobian blocks are stored with M on
    the minor (lane) axis so nothing pads to the 128-lane tile; the track
    reduction is a lane cumsum + boundary diff over the sorted order; and
    camera gathers/reductions are one-hot matmuls (exact: the 0/1 operand
    is bf16-representable, HIGHEST precision keeps f32 on the other side).
    Measured ~2.5x over the scatter/gather matvec at M=24k on v5e.
    """
    d = J_c.shape[-1]
    dc = shared_cal_dims
    f32 = J_c.dtype
    sw = jnp.sqrt(w)
    # entry-major Jacobians: (2, d, M), (2, 3, M)
    Jc_e = jnp.transpose(J_c, (1, 2, 0)) * sw[None, None, :]
    Jp_e = jnp.transpose(J_p, (1, 2, 0)) * sw[None, None, :]
    rw_e = r.T * sw[None, :]  # (2, M)

    free = (~fixed_cam).astype(f32)
    free_m = free[meas_cam]  # (M,)
    if dc > 0:
        Jc_e = jnp.concatenate(
            [Jc_e[:, : d - dc, :] * free_m[None, None, :], Jc_e[:, d - dc :, :]],
            axis=1,
        )
    else:
        Jc_e = Jc_e * free_m[None, None, :]

    # one-hot camera incidence (N, M): rides the MXU for gather+reduce
    CT = (jnp.arange(n_cam)[:, None] == meas_cam[None, :]).astype(f32)
    hp = jax.lax.Precision.HIGHEST

    # block diagonals / gradients (once per LM iteration)
    prod_cc = _tiny_einsum("rim,rjm->ijm", Jc_e, Jc_e)  # (d, d, M)
    Hcc = jnp.einsum("ijm,nm->nij", prod_cc, CT, precision=hp)  # (N, d, d)
    prod_pp = _tiny_einsum("rim,rjm->ijm", Jp_e, Jp_e)  # (3, 3, M)
    Hpp_e = _segsum_lanes(prod_pp, trk_st, trk_en)  # (3, 3, T)
    g_c = jnp.einsum("rim,rm,nm->ni", Jc_e, rw_e, CT, precision=hp)  # (N, d)
    g_p_e = _segsum_lanes(_tiny_einsum("rim,rm->im", Jp_e, rw_e), trk_st, trk_en)

    rel_coupling = None
    if prior_terms is not None:
        H_prior, g_prior, rel_coupling = prior_terms
        freeN = free[:, None]
        Hcc = Hcc + H_prior * freeN[..., None] * freeN[:, None, :]
        g_c = g_c + g_prior * freeN

    eye_d = jnp.eye(d, dtype=f32)
    eye3_e = jnp.eye(3, dtype=f32)[:, :, None]
    Hcc_d = Hcc + lam * (jnp.abs(Hcc) * eye_d) + (lam + 1e-8) * eye_d
    Hpp_de = Hpp_e + lam * (jnp.abs(Hpp_e) * eye3_e) + (lam + 1e-8) * eye3_e
    if point_prior is not None:
        pp_idx, pp_w2, pp_res = point_prior
        Hpp_de = Hpp_de.at[:, :, pp_idx].add(pp_w2 * jnp.eye(3, dtype=f32))
        g_p_e = g_p_e.at[:, pp_idx].add(pp_res)
    Hpp_inv_e = _inv3_lanes(Hpp_de)  # (3, 3, T)

    # per-measurement W block, entry-major: (d, 3, M)
    W_e = _tiny_einsum("rim,rjm->ijm", Jc_e, Jp_e)

    freeN_g = free[:, None]
    n_free_g = jnp.maximum(jnp.sum(freeN_g), 1.0)
    if karcher is not None:
        k_w2, mean_dev, R0g = karcher
        g_kar = p_einsum("nji,j->ni", R0g, mean_dev)
        g_c = g_c.at[:, :3].add((k_w2 / n_free_g) * g_kar * freeN_g)

    def track_apply(xg_T):
        """(d, M) gathered camera vectors -> (d, M) W Hpp^-1 sum_track W^T x."""
        u = _tiny_einsum("ijm,im->jm", W_e, xg_T)  # (3, M)
        s = _segsum_lanes(u, trk_st, trk_en)  # (3, T)
        v = _tiny_einsum("ijt,jt->it", Hpp_inv_e, s)  # (3, T)
        vg = v[:, meas_track]  # (3, M)
        return _tiny_einsum("ijm,jm->im", W_e, vg)  # (d, M)

    def S_matvec(x):  # x: [N, d]
        y1 = p_einsum("nij,nj->ni", Hcc_d, x)
        if karcher is not None:
            rx = p_einsum("nij,nj->ni", R0g, x[:, :3]) * freeN_g
            mean3 = jnp.sum(rx, axis=0) / n_free_g
            back = p_einsum("nji,j->ni", R0g, mean3)
            y1 = y1.at[:, :3].add((k_w2 / n_free_g) * back * freeN_g)
        xg = jnp.einsum("ni,nm->im", x, CT, precision=hp)  # (d, M)
        t = track_apply(xg)
        y2 = jnp.einsum("im,nm->ni", t, CT, precision=hp)  # (N, d)
        y = y1 - y2
        if rel_coupling is not None:
            a_idx, b_idx, Hab = rel_coupling
            freeN = free[:, None]
            xa = (x * freeN)[a_idx][:, :6]
            xb = (x * freeN)[b_idx][:, :6]
            ya = p_einsum("fij,fj->fi", Hab, xb)
            yb = p_einsum("fji,fj->fi", Hab, xa)
            y6 = jnp.zeros((n_cam, 6)).at[a_idx].add(ya).at[b_idx].add(yb)
            y = y.at[:, :6].add(y6 * freeN[:, :1])
        return y

    # rhs: b = -g_c + W Hpp^-1 g_p (reduced onto cameras)
    hv = _tiny_einsum("ijt,jt->it", Hpp_inv_e, g_p_e)  # (3, T)
    t_b = _tiny_einsum("ijm,jm->im", W_e, hv[:, meas_track])  # (d, M)
    b = -g_c + jnp.einsum("im,nm->ni", t_b, CT, precision=hp)

    if dc > 0:
        dp = d - dc

        def expand(xt):
            xp = xt[: n_cam * dp].reshape(n_cam, dp)
            y = xt[n_cam * dp :]
            return jnp.concatenate(
                [xp, jnp.broadcast_to(y[None], (n_cam, dc))], axis=-1
            )

        def reduce_(z):
            return jnp.concatenate([z[:, :dp].reshape(-1), jnp.sum(z[:, dp:], axis=0)])

        op = lambda xt: reduce_(S_matvec(expand(xt)))
        bt = reduce_(b)
        Mp_inv = jnp.linalg.inv(Hcc_d[:, :dp, :dp])
        Mc_inv = jnp.linalg.inv(jnp.sum(Hcc_d[:, dp:, dp:], axis=0))

        def precond_t(xt):
            xp = xt[: n_cam * dp].reshape(n_cam, dp)
            y = xt[n_cam * dp :]
            return jnp.concatenate(
                [p_einsum("nij,nj->ni", Mp_inv, xp).reshape(-1), Mc_inv @ y]
            )

        def cg_body_t(_, carry):
            x, rr, p, rz = carry
            Ap = op(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond_t(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return x, rr, p, rz_new

        z0 = precond_t(bt)
        init = (jnp.zeros_like(bt), bt, z0, jnp.sum(bt * z0))
        xt, *_ = jax.lax.fori_loop(0, cg_iters, cg_body_t, init)
        delta_c = expand(xt)
    else:
        M_inv = jnp.linalg.inv(Hcc_d)
        precond = lambda x: p_einsum("nij,nj->ni", M_inv, x)

        def cg_body(_, carry):
            x, rr, p, rz = carry
            Ap = S_matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return x, rr, p, rz_new

        x0 = jnp.zeros_like(b)
        z0 = precond(b)
        init = (x0, b, z0, jnp.sum(b * z0))
        delta_c, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, init)

    # back-substitute points: delta_p = -Hpp^-1 (g_p + W^T delta_c)
    dg = jnp.einsum("ni,nm->im", delta_c, CT, precision=hp)  # (d, M)
    u2 = _tiny_einsum("ijm,im->jm", W_e, dg)  # (3, M)
    s2 = _segsum_lanes(u2, trk_st, trk_en)  # (3, T)
    delta_p_e = -_tiny_einsum("ijt,jt->it", Hpp_inv_e, g_p_e + s2)
    return delta_c, delta_p_e.T


def densify_problem(prob: BAProblem, L: int = 0) -> tuple:
    """Re-layout measurements track-major padded to (T, L), flattened.

    Host-side (numpy). Row t*L+l holds the l-th measurement of track t;
    padding rows get meas_track=t, meas_cam=0, weight 0 (they contribute
    exact zeros everywhere). Returns (problem with T*L measurements, L).
    L=0 derives the next power of two >= max track length (capped at 128 —
    longer tracks mean the problem should use the iterative layouts).
    """
    import numpy as np

    trk = np.asarray(prob.meas_track)
    cam = np.asarray(prob.meas_cam)
    uv = np.asarray(prob.meas_uv)
    w = np.asarray(prob.meas_w)
    T = prob.points.shape[0]
    counts = np.bincount(trk[w > 0], minlength=T)
    max_len = int(counts.max()) if counts.size else 1
    if L <= 0:
        L = 1 << max(0, int(np.ceil(np.log2(max(max_len, 2)))))
    if max_len > L or L > 128:
        raise ValueError(f"track length {max_len} exceeds dense layout L={L}")
    new_cam = np.zeros(T * L, np.int32)
    new_trk = np.repeat(np.arange(T, dtype=np.int32), L)
    new_uv = np.zeros((T * L, 2), np.float32)
    new_w = np.zeros(T * L, np.float32)
    valid = np.flatnonzero(w > 0)
    order = valid[np.argsort(trk[valid], kind="stable")]
    slot = np.zeros(len(order), np.int64)
    if len(order):
        t_sorted = trk[order]
        starts = np.r_[0, np.flatnonzero(np.diff(t_sorted)) + 1]
        lens = np.diff(np.r_[starts, len(order)])
        slot = np.arange(len(order)) - np.repeat(starts, lens)
        dst = t_sorted.astype(np.int64) * L + slot
        new_cam[dst] = cam[order]
        new_uv[dst] = uv[order]
        new_w[dst] = w[order]
    return (
        prob.replace(
            meas_cam=jnp.asarray(new_cam),
            meas_track=jnp.asarray(new_trk),
            meas_uv=jnp.asarray(new_uv),
            meas_w=jnp.asarray(new_w),
        ),
        L,
    )


_DENSE_CALS = ("Cal3Bundler", "Cal3_S2")


def _dense_linearize(prob: BAProblem, L: int, A: jnp.ndarray,
                     optimize_intrinsics: bool, want_jac: bool = True):
    """Residuals (+ analytic Jacobians) in the track-major entry layout.

    All per-measurement tensors are (..., L, T) with the track axis minor
    (lane-resident): camera fields arrive via one-hot matmul gathers on the
    MXU, the 3D point needs NO gather at all (it is the track batch), and
    the Jacobians of the right-retraction x' = pi(K, Exp(w)^T-chain) are
    closed-form (dp_cam/dw = hat(p_cam), dp_cam/dv = -I, dp_cam/dX = R^T)
    rather than vmapped jacfwd — removing every (M, small) padded tensor
    from the LM inner loop.

    Returns (r (2,L,T), depth (L,T), Jc (2,d,L,T) | None, Jp (2,3,L,T) | None).
    """
    T = prob.points.shape[0]
    hp = jax.lax.Precision.HIGHEST
    cal = prob.cal
    cname = type(cal).__name__
    # one-hot gathers of camera-indexed fields: (N, ...) -> (..., L, T)
    Rg = jnp.einsum("nlt,nij->ijlt", A, prob.poses.R, precision=hp)
    tg = jnp.einsum("nlt,ni->ilt", A, prob.poses.t, precision=hp)
    calg = jnp.einsum("nlt,nk->klt", A, prob.cal_params, precision=hp)
    uv_e = jnp.transpose(prob.meas_uv.reshape(T, L, 2), (2, 1, 0))  # (2, L, T)

    X_e = prob.points.T[:, None, :]  # (3, 1, T) broadcast over L
    dX = X_e - tg  # (3, L, T)
    p_cam = _tiny_einsum("jilt,jlt->ilt", Rg, dX)  # R^T dX
    z = p_cam[2]
    zs = jnp.where(jnp.abs(z) < 1e-9, jnp.full_like(z, 1e-9), z)
    q = p_cam[:2] / zs[None]  # (2, L, T)

    if cname == "Cal3Bundler":
        f, k1, k2 = calg[0], calg[1], calg[2]
        aux = jnp.stack([cal.u0, cal.v0], axis=-1)
        cg = jnp.einsum("nlt,nk->klt", A, aux, precision=hp)
        r2 = q[0] * q[0] + q[1] * q[1]
        g = 1.0 + k1 * r2 + k2 * r2 * r2
        uv_hat = (f * g)[None] * q + cg
    elif cname == "Cal3_S2":
        fx, fy, s = calg[0], calg[1], calg[2]
        u0, v0 = calg[3], calg[4]
        uv_hat = jnp.stack(
            [fx * q[0] + s * q[1] + u0, fy * q[1] + v0]
        )
    else:  # pragma: no cover - guarded by BundleAdjustment.run fallback
        raise NotImplementedError(f"dense layout: unsupported calibration {cname}")
    r = uv_hat - uv_e
    if not want_jac:
        return r, z, None, None

    # D = duv/dq (2, 2, L, T)
    if cname == "Cal3Bundler":
        gp2 = 2.0 * (k1 + 2.0 * k2 * r2)  # 2 g'(r2)
        D00 = f * (g + gp2 * q[0] * q[0])
        D01 = f * gp2 * q[0] * q[1]
        D11 = f * (g + gp2 * q[1] * q[1])
        D = jnp.stack([jnp.stack([D00, D01]), jnp.stack([D01, D11])])
    else:
        zl = jnp.zeros_like(fx)
        D = jnp.stack([jnp.stack([fx, s]), jnp.stack([zl, fy])])
    # Jq = dq/dp_cam (2, 3, L, T)
    inv_z = 1.0 / zs
    zero = jnp.zeros_like(inv_z)
    Jq = jnp.stack([
        jnp.stack([inv_z, zero, -q[0] * inv_z]),
        jnp.stack([zero, inv_z, -q[1] * inv_z]),
    ])
    P = _tiny_einsum("abLt,bcLt->acLt", D, Jq)  # (2, 3, L, T)

    # pose block: [P @ hat(p_cam) | -P]
    x_, y_, z_ = p_cam[0], p_cam[1], p_cam[2]
    hatp = jnp.stack([
        jnp.stack([zero, -z_, y_]),
        jnp.stack([z_, zero, -x_]),
        jnp.stack([-y_, x_, zero]),
    ])  # (3, 3, L, T)
    Jrot = _tiny_einsum("abLt,bcLt->acLt", P, hatp)
    Jc = jnp.concatenate([Jrot, -P], axis=1)  # (2, 6, L, T)
    if optimize_intrinsics:
        if cname == "Cal3Bundler":
            Jcal = jnp.stack([
                g[None] * q,            # d/df
                (f * r2)[None] * q,     # d/dk1
                (f * r2 * r2)[None] * q # d/dk2
            ], axis=1)  # (2, 3, L, T)
        else:
            one = jnp.ones_like(fx)
            Jcal = jnp.stack([
                jnp.stack([q[0], zero]),
                jnp.stack([zero, q[1]]),
                jnp.stack([q[1], zero]),
                jnp.stack([one, zero]),
                jnp.stack([zero, one]),
            ], axis=0).transpose(1, 0, 2, 3)  # (2, 5, L, T)
        Jc = jnp.concatenate([Jc, Jcal], axis=1)
    # point block: P @ R^T  (R^T[k][j] = Rg[j][k])
    Jp = _tiny_einsum("abLt,cbLt->acLt", P, Rg)
    return r, z, Jc, Jp


def _schur_solve_dense(Jc_e, Jp_e, r_e, w_e, A, n_cam, n_track, L, fixed_cam,
                       lam, prior_terms=None, shared_cal_dims: int = 0,
                       point_prior=None, karcher=None):
    """DENSE_SCHUR: form S = Hcc_d - W Hpp^-1 W^T explicitly, solve by LU.

    Inputs are track-major entry layout from _dense_linearize: Jc_e
    (2, d, L, T), Jp_e (2, 3, L, T), r_e (2, L, T), w_e (L, T), camera
    one-hot A (N, L, T). Every reduction is a dense axis-sum or a one-hot
    matmul; the per-LM-step camera solve is exact (no CG), which also
    improves LM convergence per iteration. Layouts keep T on the minor
    (lane) axis everywhere: any tensor whose minor dims are the tiny
    (d, 3) blocks would tile-pad to (8, 128) and inflate HBM traffic 40x.
    """
    d = Jc_e.shape[1]
    dc = shared_cal_dims
    f32 = Jc_e.dtype
    T = n_track
    hp = jax.lax.Precision.HIGHEST
    sw = jnp.sqrt(w_e)  # (L, T)

    Jc = Jc_e * sw[None, None]
    Jp = Jp_e * sw[None, None]
    rw = r_e * sw[None]
    free = (~fixed_cam).astype(f32)
    free_m = jnp.einsum("nlt,n->lt", A, free, precision=hp)  # (L, T)
    if dc > 0:
        Jc = jnp.concatenate(
            [Jc[:, : d - dc] * free_m[None, None], Jc[:, d - dc :]], axis=1
        )
    else:
        Jc = Jc * free_m[None, None]

    # dense per-track reductions (sum over the L axis)
    Hpp_e = _tiny_einsum("rilt,rjlt->ijlt", Jp, Jp).sum(2)  # (3, 3, T)
    g_p_e = _tiny_einsum("rilt,rlt->ilt", Jp, rw).sum(1)  # (3, T)
    Wd = _tiny_einsum("rilt,rjlt->ijlt", Jc, Jp)  # (d, 3, L, T)
    prod_cc = _tiny_einsum("rilt,rjlt->ijlt", Jc, Jc)  # (d, d, L, T)
    Hcc = jnp.einsum("nlt,ijlt->nij", A, prod_cc, precision=hp)
    g_cm = _tiny_einsum("rilt,rlt->ilt", Jc, rw)
    g_c = jnp.einsum("nlt,ilt->ni", A, g_cm, precision=hp)

    rel_coupling = None
    if prior_terms is not None:
        H_prior, g_prior, rel_coupling = prior_terms
        freeN = free[:, None]
        Hcc = Hcc + H_prior * freeN[..., None] * freeN[:, None, :]
        g_c = g_c + g_prior * freeN

    eye_d = jnp.eye(d, dtype=f32)
    eye3_e = jnp.eye(3, dtype=f32)[:, :, None]
    Hcc_d = Hcc + lam * (jnp.abs(Hcc) * eye_d) + (lam + 1e-8) * eye_d
    Hpp_de = Hpp_e + lam * (jnp.abs(Hpp_e) * eye3_e) + (lam + 1e-8) * eye3_e
    if point_prior is not None:
        pp_idx, pp_w2, pp_res = point_prior
        Hpp_de = Hpp_de.at[:, :, pp_idx].add(pp_w2 * jnp.eye(3, dtype=f32))
        g_p_e = g_p_e.at[:, pp_idx].add(pp_res)
    Hpp_inv = _inv3_lanes(Hpp_de)  # (3, 3, T)

    # S = blockdiag(Hcc_d) - U,  U = sum_t Y_t Hpp_inv_t Y_t^T
    Y = jnp.einsum("nlt,iklt->iknt", A, Wd, precision=hp)  # (d, 3, N, T)
    Y2 = jnp.einsum("kqt,jqnt->jknt", Hpp_inv, Y, precision=hp)  # (d, 3, N, T)
    U = jnp.einsum("iknt,jkmt->nimj", Y, Y2, precision=hp)  # (N, d, N, d)
    S = (-U).at[jnp.arange(n_cam), :, jnp.arange(n_cam), :].add(Hcc_d)
    if rel_coupling is not None:
        a_idx, b_idx, Hab = rel_coupling
        wab = (free[a_idx] * free[b_idx])[:, None, None]
        S = S.at[a_idx, :6, b_idx, :6].add(Hab * wab)
        S = S.at[b_idx, :6, a_idx, :6].add(jnp.swapaxes(Hab, 1, 2) * wab)
    if karcher is not None:
        k_w2, mean_dev, R0g = karcher
        n_free_g = jnp.maximum(jnp.sum(free), 1.0)
        g_kar = p_einsum("nji,j->ni", R0g, mean_dev)
        g_c = g_c.at[:, :3].add((k_w2 / n_free_g) * g_kar * free[:, None])
        K = (k_w2 / n_free_g**2) * jnp.einsum("nji,mjk->nimk", R0g, R0g, precision=hp)
        K = K * free[:, None, None, None] * free[None, None, :, None]
        S = S.at[:, :3, :, :3].add(K)

    # rhs: b = -g_c + sum_t Y_t Hpp_inv_t g_p_t (camera-reduced)
    hv = _tiny_einsum("ijt,jt->it", Hpp_inv, g_p_e)  # (3, T)
    b = -g_c + jnp.einsum("iknt,kt->ni", Y, hv, precision=hp)

    if dc > 0:
        # exact shared-calibration reduction: pose blocks per camera, one
        # pooled dc-dim calibration variable (cols/rows summed over cams)
        dp = d - dc
        Nd = n_cam * dp
        Sp = S[:, :dp, :, :dp].reshape(Nd, Nd)
        Spc = jnp.sum(S[:, :dp, :, dp:], axis=2).reshape(Nd, dc)
        Scc = jnp.sum(S[:, dp:, :, dp:], axis=(0, 2))
        St = jnp.concatenate(
            [
                jnp.concatenate([Sp, Spc], axis=1),
                jnp.concatenate([Spc.T, Scc], axis=1),
            ],
            axis=0,
        )
        bt = jnp.concatenate([b[:, :dp].reshape(-1), jnp.sum(b[:, dp:], axis=0)])
        xt = jnp.linalg.solve(St, bt)
        delta_c = jnp.concatenate(
            [
                xt[:Nd].reshape(n_cam, dp),
                jnp.broadcast_to(xt[Nd:][None], (n_cam, dc)),
            ],
            axis=-1,
        )
    else:
        Nd = n_cam * d
        delta_c = jnp.linalg.solve(S.reshape(Nd, Nd), b.reshape(Nd)).reshape(n_cam, d)

    # back-substitute points
    xg = jnp.einsum("ni,nlt->ilt", delta_c, A, precision=hp)  # (d, L, T)
    u2 = _tiny_einsum("ijlt,ilt->jlt", Wd, xg).sum(1)  # (3, T)
    delta_p_e = -_tiny_einsum("ijt,jt->it", Hpp_inv, g_p_e + u2)
    return delta_c, delta_p_e.T


def _apply_step(prob: BAProblem, delta_c, delta_p, opts: "BAOptions") -> BAProblem:
    free = (~prob.fixed_cam)[:, None].astype(delta_c.dtype)
    d_pose = delta_c[:, :6] * free
    new_poses = prob.poses.retract(d_pose)
    if opts.optimize_intrinsics:
        if opts.shared_intrinsics:
            # the Schur solve already treats calibration as one exact shared
            # variable (delta identical per camera); apply it everywhere —
            # including pose-frozen cameras, whose K is still shared
            d_cal = jnp.broadcast_to(delta_c[:1, 6:], delta_c[:, 6:].shape)
        else:
            d_cal = delta_c[:, 6:] * free
        new_cal = prob.cal_params + d_cal
    else:
        new_cal = prob.cal_params
    return prob.replace(poses=new_poses, cal_params=new_cal, points=prob.points + delta_p)


def _robust_rho(nrm: jnp.ndarray, opts: BAOptions) -> jnp.ndarray:
    k = opts.robust_huber_px
    if opts.robust_mode == "gnc_gm" and k > 0:
        c2 = k * k
        return 0.5 * c2 * nrm**2 / (nrm**2 + c2)  # Geman-McClure
    if k > 0:
        quad = 0.5 * nrm**2
        lin = k * (nrm - 0.5 * k)
        return jnp.where(nrm <= k, quad, lin)
    return 0.5 * nrm**2


def _extras_cost(prob: BAProblem, opts: BAOptions, extras) -> jnp.ndarray:
    c = jnp.float32(0.0)
    calp0, aidx, aval, R0 = extras
    if opts.cal_prior_weight > 0 and opts.optimize_intrinsics:
        c = c + 0.5 * opts.cal_prior_weight**2 * jnp.sum(
            (prob.cal_params - calp0) ** 2
        )
    if opts.first_point_prior_weight > 0:
        c = c + 0.5 * opts.first_point_prior_weight**2 * jnp.sum(
            (prob.points[aidx] - aval) ** 2
        )
    if opts.gauge == "karcher":
        from gtsfm_tpu.geometry import so3 as _so3

        dev = _so3.logmap(jnp.einsum("nij,nkj->nik", prob.poses.R, R0, precision=jax.lax.Precision.HIGHEST))
        # free-masked mean, matching _karcher_dev (the solver's model) so
        # the accept/reject cost and the step direction share one objective
        freeN = (~prob.fixed_cam).astype(dev.dtype)[:, None]
        mean_dev = jnp.sum(dev * freeN, axis=0) / jnp.maximum(jnp.sum(freeN), 1.0)
        c = c + 0.5 * opts.karcher_weight**2 * jnp.sum(mean_dev**2)
    return c


def _cost_dense(prob: BAProblem, opts: BAOptions, extras, L: int,
                A: jnp.ndarray) -> jnp.ndarray:
    """_cost on the track-major entry layout (no (M, small) tensors)."""
    T = prob.points.shape[0]
    r_e, depth_e, _, _ = _dense_linearize(prob, L, A, False, want_jac=False)
    nrm = jnp.sqrt(r_e[0] ** 2 + r_e[1] ** 2)
    base = prob.meas_w.reshape(T, L).T * (depth_e > 1e-6)
    c = jnp.sum(base * _robust_rho(nrm, opts)) / (
        opts.measurement_sigma_px**2
    ) + _prior_cost(prob)
    if extras is not None:
        c = c + _extras_cost(prob, opts, extras)
    return c


def _cost(prob: BAProblem, opts: BAOptions, extras=None) -> jnp.ndarray:
    r, depth = _residuals(prob)
    nrm = jnp.linalg.norm(r, axis=-1)
    base = prob.meas_w * (depth > 1e-6)
    rho = _robust_rho(nrm, opts)
    c = jnp.sum(base * rho) / (opts.measurement_sigma_px**2) + _prior_cost(prob)
    if extras is not None:
        c = c + _extras_cost(prob, opts, extras)
    return c


@partial(jax.jit, static_argnames=("opts",))
@precise
def _optimize_jit(prob: BAProblem, opts: BAOptions):
    n_cam = prob.fixed_cam.shape[0]
    n_track = prob.points.shape[0]

    trk_st = trk_en = None
    if opts.layout == "entry":
        # sort measurements by track once per solve: the entry-major solver
        # reduces contiguous segments with a lane cumsum. Padding (w=0)
        # contributes exact zeros wherever it lands. The permutation is
        # applied to the whole problem so residuals/Jacobians/solve stay
        # aligned; measurement order is irrelevant to the solution.
        order = jnp.argsort(prob.meas_track, stable=True)
        prob = prob.replace(
            meas_cam=prob.meas_cam[order],
            meas_track=prob.meas_track[order],
            meas_uv=prob.meas_uv[order],
            meas_w=prob.meas_w[order],
        )
        tids = jnp.arange(n_track)
        trk_st = jnp.searchsorted(prob.meas_track, tids, side="left")
        trk_en = jnp.searchsorted(prob.meas_track, tids, side="right")

    # gauge / regularization anchors, captured at the start of the solve
    calp0 = prob.cal.to_params()
    w_per_track = jax.ops.segment_sum(prob.meas_w, prob.meas_track, num_segments=n_track)
    anchor_idx = jnp.argmax(w_per_track)  # best-constrained point
    anchor_val = prob.points[anchor_idx]
    R0 = prob.poses.R  # Karcher anchor: rotations at solve start
    extras = (calp0, anchor_idx, anchor_val, R0)

    def _karcher_dev(poses):
        from gtsfm_tpu.geometry import so3 as _so3

        dev = _so3.logmap(jnp.einsum("nij,nkj->nik", poses.R, R0, precision=jax.lax.Precision.HIGHEST))
        freeN = (~prob.fixed_cam).astype(dev.dtype)[:, None]
        return jnp.sum(dev * freeN, axis=0) / jnp.maximum(jnp.sum(freeN), 1.0)

    L = opts.dense_track_len
    A_dense = None
    if opts.layout == "dense":
        # camera one-hot incidence (N, L, T), fixed for the whole solve
        A_dense = (
            jnp.arange(n_cam)[:, None, None]
            == prob.meas_cam.reshape(n_track, L).T[None]
        ).astype(jnp.float32)

    def _priors_for_step(prob, d):
        prior_terms = _pose_prior_terms(prob, d)
        if opts.cal_prior_weight > 0 and opts.optimize_intrinsics:
            H_prior, g_prior, rel = prior_terms
            w2 = opts.cal_prior_weight**2
            cal_eye = jnp.zeros((d, d)).at[jnp.arange(6, d), jnp.arange(6, d)].set(w2)
            g_prior = g_prior.at[:, 6:].add(w2 * (prob.cal_params - calp0))
            prior_terms = (H_prior + cal_eye[None], g_prior, rel)
        point_prior = None
        if opts.first_point_prior_weight > 0:
            w2p = opts.first_point_prior_weight**2
            point_prior = (
                anchor_idx, w2p, w2p * (prob.points[anchor_idx] - anchor_val)
            )
        karcher = (
            (opts.karcher_weight**2, _karcher_dev(prob.poses), R0)
            if opts.gauge == "karcher" else None
        )
        return prior_terms, point_prior, karcher

    shared_dc = (
        prob.cal_params.shape[-1]
        if (opts.optimize_intrinsics and opts.shared_intrinsics)
        else 0
    )

    def step_dense(carry, it):
        prob, lam, cost = carry
        mu = jnp.maximum(opts.gnc_mu_init * opts.gnc_gamma**it, 1.0)
        r_e, depth_e, Jc_e, Jp_e = _dense_linearize(
            prob, L, A_dense, opts.optimize_intrinsics
        )
        nrm = jnp.sqrt(r_e[0] ** 2 + r_e[1] ** 2)
        base_e = prob.meas_w.reshape(n_track, L).T
        w_e = (
            base_e * _robust_w_from_nrm(nrm, opts, mu) * (depth_e > 1e-6)
            / (opts.measurement_sigma_px**2)
        )
        d = Jc_e.shape[1]
        prior_terms, point_prior, karcher = _priors_for_step(prob, d)
        delta_c, delta_p = _schur_solve_dense(
            Jc_e, Jp_e, r_e, w_e, A_dense, n_cam, n_track, L,
            prob.fixed_cam, lam, prior_terms=prior_terms,
            shared_cal_dims=shared_dc, point_prior=point_prior,
            karcher=karcher,
        )
        cand = _apply_step(prob, delta_c, delta_p, opts)
        new_cost = _cost_dense(cand, opts, extras, L, A_dense)
        accept = new_cost < cost
        prob_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), prob, cand)
        lam_next = jnp.clip(
            jnp.where(accept, lam * opts.lambda_down, lam * opts.lambda_up),
            opts.min_lambda, opts.max_lambda,
        )
        cost_next = jnp.where(accept, new_cost, cost)
        return (prob_next, lam_next, cost_next), cost_next

    def step(carry, it):
        prob, lam, cost = carry
        mu = jnp.maximum(opts.gnc_mu_init * opts.gnc_gamma**it, 1.0)
        r, depth = _residuals(prob)
        w = _robust_weights(r, depth, prob.meas_w, opts, mu)
        J_c, J_p = _jacobians(prob, opts.optimize_intrinsics)
        d = J_c.shape[-1]
        prior_terms, point_prior, karcher = _priors_for_step(prob, d)
        if opts.layout == "entry":
            delta_c, delta_p = _schur_solve_entry(
                J_c, J_p, r, w, prob.meas_cam, prob.meas_track, trk_st, trk_en,
                n_cam, n_track, prob.fixed_cam, lam, opts.cg_iterations,
                prior_terms=prior_terms, shared_cal_dims=shared_dc,
                point_prior=point_prior, karcher=karcher,
            )
        else:
            delta_c, delta_p = _schur_solve(
                J_c, J_p, r, w, prob.meas_cam, prob.meas_track,
                n_cam, n_track, prob.fixed_cam, lam, opts.cg_iterations,
                prior_terms=prior_terms, shared_cal_dims=shared_dc,
                point_prior=point_prior, karcher=karcher,
            )
        cand = _apply_step(prob, delta_c, delta_p, opts)
        new_cost = _cost(cand, opts, extras)
        accept = new_cost < cost
        prob_next = jax.tree.map(lambda a, b: jnp.where(accept, b, a), prob, cand)
        lam_next = jnp.clip(
            jnp.where(accept, lam * opts.lambda_down, lam * opts.lambda_up),
            opts.min_lambda, opts.max_lambda,
        )
        cost_next = jnp.where(accept, new_cost, cost)
        return (prob_next, lam_next, cost_next), cost_next

    if opts.layout == "dense":
        step = step_dense
        cost0 = _cost_dense(prob, opts, extras, L, A_dense)
    else:
        cost0 = _cost(prob, opts, extras)
    (prob_f, _, cost_f), cost_hist = jax.lax.scan(
        step, (prob, jnp.asarray(opts.init_lambda, jnp.float32), cost0),
        jnp.arange(opts.max_iterations),
    )
    return prob_f, cost0, cost_f, cost_hist


class BundleAdjustment:
    """User-facing BA optimizer over SfmData.

    Mirrors BundleAdjustmentOptimizer.run_ba (bundle_adjustment.py:347-410):
    optional multi-stage optimize + reprojection filtering is provided by
    run_staged() like the reference's [10, 5, 3]-px schedule
    (bundle_adjustment.py:595-633, configs/unified.yaml).
    """

    def __init__(self, options: BAOptions = BAOptions(), mesh=None):
        """mesh: optional jax.sharding.Mesh — measurements shard over its
        'data' axis (parallel/sharding.shard_ba_problem), the TPU analog of
        the reference's per-task Dask BA placement."""
        self.options = options
        self.mesh = mesh

    def run(self, data: SfmData, fixed_cam=None, **prior_kwargs) -> tuple:
        """-> (optimized SfmData, dict metrics). prior_kwargs forward to
        problem_from_sfm_data (rel_edges/rel_meas/rel_weight for rig
        between-factors, prior_pose/prior_weight for absolute priors)."""
        prob = problem_from_sfm_data(data, fixed_cam=fixed_cam, **prior_kwargs)
        opts_run = self.options
        if opts_run.layout == "dense" and self.mesh is None:
            if type(prob.cal).__name__ not in _DENSE_CALS:
                # no analytic linearization for this model: iterative path
                opts_run = opts_run._replace(layout="entry")
            else:
                try:
                    prob, L = densify_problem(prob, opts_run.dense_track_len)
                    opts_run = opts_run._replace(dense_track_len=L)
                except ValueError:
                    # track longer than the dense cap: iterative fallback
                    opts_run = opts_run._replace(layout="entry")
        if self.mesh is not None:
            from gtsfm_tpu.parallel.sharding import shard_ba_problem

            dsize = self.mesh.shape["data"]
            M = prob.meas_cam.shape[0]
            M_pad = ((M + dsize - 1) // dsize) * dsize
            if M_pad != M:
                pad = M_pad - M
                prob = prob.replace(
                    meas_cam=jnp.concatenate([prob.meas_cam, jnp.zeros(pad, jnp.int32)]),
                    meas_track=jnp.concatenate([prob.meas_track, jnp.zeros(pad, jnp.int32)]),
                    meas_uv=jnp.concatenate([prob.meas_uv, jnp.zeros((pad, 2), jnp.float32)]),
                    meas_w=jnp.concatenate([prob.meas_w, jnp.zeros(pad, jnp.float32)]),
                )
            prob = shard_ba_problem(self.mesh, prob)
            # sharded measurement axis: cumsum/one-hot layout would
            # serialize across devices — use the scatter formulation
            opts_sharded = self.options._replace(layout="scatter")
            with self.mesh:
                prob_f, cost0, cost_f, hist = _optimize_jit(prob, opts_sharded)
        else:
            prob_f, cost0, cost_f, hist = _optimize_jit(prob, opts_run)
        out = problem_to_sfm_data(prob_f, data)
        metrics = {
            "initial_cost": float(cost0),
            "final_cost": float(cost_f),
            "iterations": int(self.options.max_iterations),
            "cost_history": [float(c) for c in hist],
        }
        opts = self.options
        if opts.robust_mode == "gnc_gm" and opts.gnc_weight_threshold > 0:
            # final GNC factor weights at converged mu=1: ((c^2/(r^2+c^2))^2;
            # measurements the graduated loss has annealed away are outliers
            r, depth = _residuals(problem_from_sfm_data(out))
            nrm2 = jnp.sum(r * r, axis=-1)
            c2 = opts.robust_huber_px**2
            w_gnc = (c2 / (nrm2 + c2)) ** 2 * (depth > 1e-6)
            keep = out.meas_mask & (w_gnc >= opts.gnc_weight_threshold)
            out = out.replace(meas_mask=keep).filter_by_track_length(
                opts.min_track_length
            )
            metrics["gnc_measurements_removed"] = int(
                jnp.sum(data.meas_mask) - jnp.sum(out.meas_mask)
            )
        return out, metrics

    def run_compact(self, data: SfmData, fixed_cam=None, pad_hwm=None,
                    **prior_kwargs) -> tuple:
        """run() on a compacted, pow2-bucketed copy of the scene.

        Cameras, TRACKS, and MEASUREMENTS are each remapped to dense local
        index spaces sized to the next power of two >= the ACTIVE count.
        Solve cost then scales with the live subproblem rather than the
        accumulated padding (a hierarchical merge concatenates its
        children's padded track axes, so by the root most slots are dead),
        and XLA executables are shared across the many similarly-sized
        solves of a merge tree instead of recompiling per node. Results
        are scattered back into the original global layout.

        pad_hwm: optional shared high-water-mark dict — bucket sizes only
        ever grow within the dict's scope, so one merge tree's solves
        share traces even when live counts straddle pow2 boundaries.
        """
        import numpy as np

        from gtsfm_tpu.utils.numerics import ceil_pow2

        def _bucket(key: str, raw: int, mult: int) -> int:
            v = ceil_pow2(raw, mult)
            if pad_hwm is not None:
                v = max(v, pad_hwm.get(key, 0))
                pad_hwm[key] = v
            return v

        N = data.max_cameras
        pm = np.asarray(data.pose_mask)
        mm = np.asarray(data.meas_mask)
        with_meas = np.zeros(N, bool)
        with_meas[np.asarray(data.meas_cam)[mm]] = True
        active = pm | with_meas
        act_idx = np.flatnonzero(active)
        if len(act_idx) == 0 or not mm.any():
            return data, {"initial_cost": 0.0, "final_cost": 0.0, "iterations": 0}
        n_loc = _bucket("ba_cams", len(act_idx), 8)
        pad_idx = np.concatenate(
            [act_idx, np.full(n_loc - len(act_idx), act_idx[0], np.int64)]
        )
        g2l = np.full(N, -1, np.int64)  # inactive cameras map nowhere
        g2l[act_idx] = np.arange(len(act_idx))

        # live tracks: masked-in ones plus any referenced by a live
        # measurement (kept so the meas remap below never dangles)
        T = data.max_tracks
        tm = np.asarray(data.track_mask)
        mt = np.asarray(data.meas_track)
        live_t = tm.copy()
        live_t[mt[mm]] = True
        t_idx = np.flatnonzero(live_t)
        T_loc = _bucket("ba_tracks", len(t_idx), 16)
        t_pad_idx = np.concatenate(
            [t_idx, np.full(T_loc - len(t_idx), t_idx[0], np.int64)]
        )
        t_g2l = np.zeros(T, np.int64)
        t_g2l[t_idx] = np.arange(len(t_idx))

        m_idx = np.flatnonzero(mm)
        M_loc = _bucket("ba_meas", len(m_idx), 16)
        m_pad_idx = np.concatenate(
            [m_idx, np.full(M_loc - len(m_idx), m_idx[0], np.int64)]
        )
        jp = jnp.asarray(pad_idx)
        jt = jnp.asarray(t_pad_idx)
        jm = jnp.asarray(m_pad_idx)

        local = data.replace(
            poses=jax.tree.map(lambda a: a[jp], data.poses),
            pose_mask=jnp.asarray(data.pose_mask)[jp]
            & (jnp.arange(n_loc) < len(act_idx)),
            cal=jax.tree.map(lambda a: jnp.asarray(a)[jp], data.cal),
            points=jnp.asarray(data.points)[jt],
            track_mask=jnp.asarray(data.track_mask)[jt]
            & (jnp.arange(T_loc) < len(t_idx)),
            meas_cam=jnp.asarray(np.maximum(g2l, 0), jnp.int32)[
                jnp.asarray(data.meas_cam)[jm]
            ],
            meas_track=jnp.asarray(t_g2l, jnp.int32)[jnp.asarray(data.meas_track)[jm]],
            meas_uv=jnp.asarray(data.meas_uv)[jm],
            meas_mask=jnp.asarray(data.meas_mask)[jm]
            & (jnp.arange(M_loc) < len(m_idx)),
        )
        if fixed_cam is None:
            fixed_local = None
        else:
            fc = np.asarray(fixed_cam)
            fixed_local = jnp.asarray(
                np.concatenate(
                    [fc[act_idx], np.ones(n_loc - len(act_idx), bool)]
                )
            )
        if prior_kwargs.get("rel_edges") is not None:
            prior_kwargs = dict(prior_kwargs)
            re_loc = g2l[np.asarray(prior_kwargs["rel_edges"])]
            # drop (zero-weight) rig between-factors touching inactive
            # cameras instead of silently re-anchoring them to slot 0
            re_ok = np.all(re_loc >= 0, axis=1)
            prior_kwargs["rel_edges"] = jnp.asarray(np.maximum(re_loc, 0), jnp.int32)
            if prior_kwargs.get("rel_weight") is not None:
                prior_kwargs["rel_weight"] = jnp.asarray(
                    np.asarray(prior_kwargs["rel_weight"], np.float32) * re_ok
                )
            else:
                prior_kwargs["rel_weight"] = jnp.asarray(re_ok, jnp.float32)
        if prior_kwargs.get("prior_pose") is not None:
            prior_kwargs = dict(prior_kwargs)
            prior_kwargs["prior_pose"] = jax.tree.map(
                lambda a: a[jp], prior_kwargs["prior_pose"]
            )
            prior_kwargs["prior_weight"] = jnp.asarray(
                prior_kwargs["prior_weight"]
            )[jp] * (jnp.arange(n_loc) < len(act_idx))

        # layout by problem size and backend: the dense-Schur camera
        # contraction scales as N^2 * T — MXU-trivial to ~1k cameras but
        # heavy on CPU test hosts; large-N solves use the iterative paths
        opts_c = self.options
        if opts_c.layout == "dense":
            if jax.default_backend() == "cpu" and len(act_idx) > 96:
                opts_c = opts_c._replace(layout="scatter")
            elif len(act_idx) > 1024:
                opts_c = opts_c._replace(layout="entry")
        solver = self if opts_c is self.options else BundleAdjustment(opts_c, mesh=self.mesh)
        out_l, metrics = solver.run(local, fixed_cam=fixed_local, **prior_kwargs)

        ai = jnp.asarray(act_idx)
        nl = len(act_idx)
        ti = jnp.asarray(t_idx)
        nt = len(t_idx)
        mi = jnp.asarray(m_idx)
        nm = len(m_idx)
        out = data.replace(
            poses=jax.tree.map(
                lambda g, l: g.at[ai].set(l[:nl]), data.poses, out_l.poses
            ),
            cal=jax.tree.map(
                lambda g, l: jnp.asarray(g).at[ai].set(l[:nl]), data.cal, out_l.cal
            ),
            points=jnp.asarray(data.points).at[ti].set(out_l.points[:nt]),
            track_mask=jnp.asarray(data.track_mask)
            .at[ti]
            .set(out_l.track_mask[:nt]),
            meas_mask=jnp.asarray(data.meas_mask).at[mi].set(out_l.meas_mask[:nm]),
        )
        return out, metrics

    def run_staged(self, data: SfmData, reproj_thresholds=(10.0, 5.0, 3.0), fixed_cam=None):
        """Optimize, filter by reprojection error, repeat — the reference's
        staged schedule. Returns (SfmData, metrics list)."""
        all_metrics = []
        for thresh in reproj_thresholds:
            data, m = self.run(data, fixed_cam=fixed_cam)
            data = data.filter_by_reprojection_error(thresh)
            m["filter_threshold_px"] = thresh
            m["tracks_after_filter"] = data.number_tracks()
            all_metrics.append(m)
        return data, all_metrics
