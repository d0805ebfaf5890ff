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
from gtsfm_tpu.utils.numerics import einsum as p_einsum


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
    k = opts.robust_huber_px
    if opts.robust_mode == "gnc_gm" and k > 0:
        c2 = k * k
        w_rob = (mu * c2 / (nrm**2 + mu * c2)) ** 2
    elif k > 0:
        w_rob = jnp.minimum(1.0, k / jnp.maximum(nrm, 1e-12))
    else:
        w_rob = jnp.ones_like(nrm)
    return base_w * w_rob * (depth > 1e-6) / (opts.measurement_sigma_px**2)


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


def _cost(prob: BAProblem, opts: BAOptions, extras=None) -> jnp.ndarray:
    r, depth = _residuals(prob)
    nrm = jnp.linalg.norm(r, axis=-1)
    base = prob.meas_w * (depth > 1e-6)
    k = opts.robust_huber_px
    if opts.robust_mode == "gnc_gm" and k > 0:
        c2 = k * k
        rho = 0.5 * c2 * nrm**2 / (nrm**2 + c2)  # Geman-McClure
    elif k > 0:
        quad = 0.5 * nrm**2
        lin = k * (nrm - 0.5 * k)
        rho = jnp.where(nrm <= k, quad, lin)
    else:
        rho = 0.5 * nrm**2
    c = jnp.sum(base * rho) / (opts.measurement_sigma_px**2) + _prior_cost(prob)
    if extras is not None:
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

            dev = _so3.logmap(jnp.einsum("nij,nkj->nik", prob.poses.R, R0))
            mean_dev = jnp.mean(dev, axis=0)
            c = c + 0.5 * opts.karcher_weight**2 * jnp.sum(mean_dev**2)
    return c


@partial(jax.jit, static_argnames=("opts",))
def _optimize_jit(prob: BAProblem, opts: BAOptions):
    n_cam = prob.fixed_cam.shape[0]
    n_track = prob.points.shape[0]

    # gauge / regularization anchors, captured at the start of the solve
    calp0 = prob.cal.to_params()
    w_per_track = jax.ops.segment_sum(prob.meas_w, prob.meas_track, num_segments=n_track)
    anchor_idx = jnp.argmax(w_per_track)  # best-constrained point
    anchor_val = prob.points[anchor_idx]
    R0 = prob.poses.R  # Karcher anchor: rotations at solve start
    extras = (calp0, anchor_idx, anchor_val, R0)

    def _karcher_dev(poses):
        from gtsfm_tpu.geometry import so3 as _so3

        dev = _so3.logmap(jnp.einsum("nij,nkj->nik", poses.R, R0))
        freeN = (~prob.fixed_cam).astype(dev.dtype)[:, None]
        return jnp.sum(dev * freeN, axis=0) / jnp.maximum(jnp.sum(freeN), 1.0)

    def step(carry, it):
        prob, lam, cost = carry
        mu = jnp.maximum(opts.gnc_mu_init * opts.gnc_gamma**it, 1.0)
        r, depth = _residuals(prob)
        w = _robust_weights(r, depth, prob.meas_w, opts, mu)
        J_c, J_p = _jacobians(prob, opts.optimize_intrinsics)
        d = J_c.shape[-1]
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
        shared_dc = (
            prob.cal_params.shape[-1]
            if (opts.optimize_intrinsics and opts.shared_intrinsics)
            else 0
        )
        delta_c, delta_p = _schur_solve(
            J_c, J_p, r, w, prob.meas_cam, prob.meas_track,
            n_cam, n_track, prob.fixed_cam, lam, opts.cg_iterations,
            prior_terms=prior_terms, shared_cal_dims=shared_dc,
            point_prior=point_prior,
            karcher=(
                (opts.karcher_weight**2, _karcher_dev(prob.poses), R0)
                if opts.gauge == "karcher" else None
            ),
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
            with self.mesh:
                prob_f, cost0, cost_f, hist = _optimize_jit(prob, self.options)
        else:
            prob_f, cost0, cost_f, hist = _optimize_jit(prob, self.options)
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
