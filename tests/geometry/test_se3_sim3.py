import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

from gtsfm_tpu.geometry import SE3, Sim3
from gtsfm_tpu.geometry.sim3 import align_points_umeyama, align_poses_sim3, align_poses_sim3_robust


def _rand_pose(seed=0):
    rng = np.random.default_rng(seed)
    R = ScipyRot.random(random_state=seed).as_matrix().astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    return SE3(R=jnp.asarray(R), t=jnp.asarray(t))


def test_compose_inverse_identity():
    T = _rand_pose(0)
    I = T.compose(T.inverse())
    np.testing.assert_allclose(np.asarray(I.R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0, atol=1e-5)


def test_between():
    A, B = _rand_pose(1), _rand_pose(2)
    AB = A.between(B)
    B2 = A.compose(AB)
    np.testing.assert_allclose(np.asarray(B2.R), np.asarray(B.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(B2.t), np.asarray(B.t), atol=1e-5)


def test_transform_roundtrip():
    T = _rand_pose(3)
    p = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32))
    p2 = T.transform_to(T.transform(p))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    xi = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32) * 0.7)
    T = SE3.exp(xi)
    xi2 = T.log()
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_exp_zero_is_identity():
    T = SE3.exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T.R), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(T.t), 0, atol=1e-7)


def test_retract_local_inverse():
    T = _rand_pose(5)
    xi = jnp.asarray(np.random.default_rng(5).normal(size=6).astype(np.float32) * 0.1)
    T2 = T.retract(xi)
    np.testing.assert_allclose(np.asarray(T.local(T2)), np.asarray(xi), atol=1e-5)


def test_matrix_roundtrip():
    T = _rand_pose(6)
    T2 = SE3.from_matrix(T.matrix())
    np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R))
    np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t))


def test_sim3_compose_inverse():
    rng = np.random.default_rng(7)
    S = Sim3(
        R=jnp.asarray(ScipyRot.random(random_state=7).as_matrix().astype(np.float32)),
        t=jnp.asarray(rng.normal(size=3).astype(np.float32)),
        s=jnp.asarray(np.float32(2.3)),
    )
    I = S.compose(S.inverse())
    np.testing.assert_allclose(np.asarray(I.R), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), 0, atol=1e-5)
    np.testing.assert_allclose(float(I.s), 1.0, atol=1e-6)


def test_umeyama_recovers_known_sim3():
    rng = np.random.default_rng(8)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    R = ScipyRot.random(random_state=8).as_matrix().astype(np.float32)
    s, t = 1.7, np.array([0.5, -2.0, 3.0], np.float32)
    tgt = s * src @ R.T + t
    sim = align_points_umeyama(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(sim.R), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sim.t), t, atol=1e-4)
    assert abs(float(sim.s) - s) < 1e-4


def test_align_poses_sim3():
    rng = np.random.default_rng(9)
    n = 20
    Rs = ScipyRot.random(n, random_state=9).as_matrix().astype(np.float32)
    ts = rng.normal(size=(n, 3)).astype(np.float32)
    src = SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts))
    S_true = Sim3(
        R=jnp.asarray(ScipyRot.random(random_state=10).as_matrix().astype(np.float32)),
        t=jnp.asarray(np.array([1.0, 2.0, -0.5], np.float32)),
        s=jnp.asarray(np.float32(0.6)),
    )
    tgt = S_true.transform_pose(src)
    S_est = align_poses_sim3(src, tgt)
    np.testing.assert_allclose(np.asarray(S_est.R), np.asarray(S_true.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(S_est.t), np.asarray(S_true.t), atol=1e-3)
    assert abs(float(S_est.s) - float(S_true.s)) < 1e-4


def test_align_poses_sim3_robust_with_outliers():
    rng = np.random.default_rng(11)
    n = 30
    Rs = ScipyRot.random(n, random_state=11).as_matrix().astype(np.float32)
    ts = rng.normal(size=(n, 3)).astype(np.float32)
    src = SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts))
    S_true = Sim3(
        R=jnp.asarray(ScipyRot.random(random_state=12).as_matrix().astype(np.float32)),
        t=jnp.asarray(np.array([0.3, -1.0, 2.0], np.float32)),
        s=jnp.asarray(np.float32(1.4)),
    )
    tgt = S_true.transform_pose(src)
    # corrupt 3 target centers badly
    t_corrupt = np.asarray(tgt.t).copy()
    t_corrupt[:3] += 25.0
    tgt = SE3(R=tgt.R, t=jnp.asarray(t_corrupt))
    S_est = align_poses_sim3_robust(src, tgt, iters=10)
    assert abs(float(S_est.s) - float(S_true.s)) < 0.05
    np.testing.assert_allclose(np.asarray(S_est.t), np.asarray(S_true.t), atol=0.2)
