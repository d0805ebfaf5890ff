import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from gtsfm_tpu.geometry import so3


def _random_rots(n, seed=0):
    return ScipyRot.random(n, random_state=seed).as_matrix().astype(np.float32)


def test_expmap_matches_scipy():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 3)).astype(np.float32)
    R = np.asarray(so3.expmap(jnp.asarray(w)))
    R_ref = ScipyRot.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_logmap_roundtrip():
    R = _random_rots(128)
    w = so3.logmap(jnp.asarray(R))
    R2 = np.asarray(so3.expmap(w))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_logmap_small_and_pi_angles():
    # near-identity
    w_small = jnp.array([[1e-6, -2e-6, 1e-6]], jnp.float32)
    R = so3.expmap(w_small)
    np.testing.assert_allclose(np.asarray(so3.logmap(R)), np.asarray(w_small), atol=1e-7)
    # exactly-pi rotations about each axis
    for axis in np.eye(3):
        R_pi = ScipyRot.from_rotvec(np.pi * axis).as_matrix().astype(np.float32)
        w = np.asarray(so3.logmap(jnp.asarray(R_pi)))
        assert abs(np.linalg.norm(w) - np.pi) < 1e-3
        R_rec = np.asarray(so3.expmap(jnp.asarray(w)))
        np.testing.assert_allclose(R_rec, R_pi, atol=1e-4)


def test_expmap_grad_no_nan_at_zero():
    g = jax.grad(lambda w: jnp.sum(so3.expmap(w)))(jnp.zeros(3))
    assert not np.any(np.isnan(np.asarray(g)))


def test_quat_roundtrip():
    R = _random_rots(64, seed=1)
    q = so3.to_quat(jnp.asarray(R))
    R2 = np.asarray(so3.from_quat(q))
    np.testing.assert_allclose(R2, R, atol=1e-5)
    # canonical sign
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_quat_matches_scipy_convention():
    R = _random_rots(16, seed=2)
    q = np.asarray(so3.to_quat(jnp.asarray(R)))  # (w, x, y, z)
    q_ref = ScipyRot.from_matrix(R).as_quat()  # (x, y, z, w)
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
    q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q, q_ref, atol=1e-5)


def test_project_returns_rotation():
    rng = np.random.default_rng(3)
    M = jnp.asarray(rng.normal(size=(10, 3, 3)).astype(np.float32))
    R = so3.project(M)
    RtR = np.asarray(jnp.swapaxes(R, -1, -2) @ R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    assert np.allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_relative_angle():
    R1 = jnp.eye(3)
    R2 = so3.expmap(jnp.array([0.0, 0.0, 0.3]))
    assert abs(float(so3.relative_angle_rad(R1, R2)) - 0.3) < 1e-5


def test_karcher_mean_of_identical_rotations():
    R = jnp.asarray(_random_rots(1)[0])
    Rs = jnp.tile(R[None], (5, 1, 1))
    mean = so3.karcher_mean(Rs)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(R), atol=1e-5)


def test_karcher_mean_symmetric_perturbations():
    base = jnp.asarray(_random_rots(1, seed=5)[0])
    delta = jnp.array([0.1, 0.0, 0.0])
    Rs = jnp.stack([base @ so3.expmap(delta), base @ so3.expmap(-delta)])
    mean = so3.karcher_mean(Rs, iters=30)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(base), atol=1e-5)


@pytest.mark.parametrize("fn", [so3.expmap, so3.logmap])
def test_jit_and_vmap(fn):
    if fn is so3.expmap:
        x = jnp.zeros((4, 3))
    else:
        x = jnp.tile(jnp.eye(3), (4, 1, 1))
    out = jax.jit(jax.vmap(fn))(x)
    assert not np.any(np.isnan(np.asarray(out)))


def test_logmap_near_pi_precision():
    # regression: sin(theta) amplification made this err by ~0.1 before
    w = jnp.array([[3.14, 0.0, 0.0], [0.0, 3.1415, 0.0], [1.8, -1.8, 1.4]])
    R = so3.expmap(w)
    np.testing.assert_allclose(np.asarray(so3.logmap(R)), np.asarray(w), atol=5e-4)


def test_logmap_grad_no_nan_at_identity():
    g = jax.grad(lambda R: jnp.sum(so3.logmap(R)))(jnp.eye(3))
    assert not np.any(np.isnan(np.asarray(g)))
