import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from gtsfm_tpu.geometry import SE3, Cal3Bundler, Cal3_S2, Cal3DS2, Cal3Fisheye, PinholeCamera


RNG = np.random.default_rng(0)
P_INTR = jnp.asarray(RNG.uniform(-0.4, 0.4, size=(32, 2)).astype(np.float32))


@pytest.mark.parametrize(
    "cal",
    [
        Cal3Bundler.create(500.0, -0.1, 0.02, 320.0, 240.0),
        Cal3_S2.create(500.0, 480.0, 1.5, 320.0, 240.0),
        Cal3DS2.create(500.0, 480.0, 0.0, 320.0, 240.0, -0.2, 0.05, 1e-3, -2e-3),
        Cal3Fisheye.create(400.0, 400.0, 0.0, 320.0, 240.0, -0.02, 0.004, -0.001, 0.0002),
    ],
)
def test_calibrate_uncalibrate_roundtrip(cal):
    uv = cal.uncalibrate(P_INTR)
    p2 = cal.calibrate(uv)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(P_INTR), atol=2e-4)


def test_cal3bundler_matches_formula():
    cal = Cal3Bundler.create(100.0, -0.1, 0.01, 10.0, 20.0)
    p = jnp.array([0.2, -0.3])
    r2 = 0.2**2 + 0.3**2
    g = 1 - 0.1 * r2 + 0.01 * r2**2
    expected = np.array([100 * g * 0.2 + 10, 100 * g * (-0.3) + 20])
    np.testing.assert_allclose(np.asarray(cal.uncalibrate(p)), expected, rtol=1e-6)


def test_params_roundtrip():
    cal = Cal3DS2.create(500.0, 480.0, 1.0, 320.0, 240.0, -0.2, 0.05, 1e-3, -2e-3)
    cal2 = cal.with_params(cal.to_params())
    np.testing.assert_allclose(np.asarray(cal2.to_params()), np.asarray(cal.to_params()))
    assert cal.dof == 9
    assert Cal3Bundler.dof == 3


def test_K_matrix():
    cal = Cal3_S2.create(500.0, 480.0, 2.0, 320.0, 240.0)
    K = np.asarray(cal.K())
    np.testing.assert_allclose(K, [[500, 2, 320], [0, 480, 240], [0, 0, 1]])


def test_camera_project_backproject():
    R = ScipyRot.random(random_state=1).as_matrix().astype(np.float32)
    t = np.array([0.5, -1.0, 2.0], np.float32)
    cam = PinholeCamera(
        pose=SE3(R=jnp.asarray(R), t=jnp.asarray(t)),
        cal=Cal3Bundler.create(500.0, -0.05, 0.01, 320.0, 240.0),
    )
    # points in front of the camera
    p_cam = RNG.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    p_cam[:, 2] = RNG.uniform(2, 8, size=16)
    p_world = np.asarray(cam.pose.transform(jnp.asarray(p_cam)))
    uv, depth = cam.project(jnp.asarray(p_world))
    np.testing.assert_allclose(np.asarray(depth), p_cam[:, 2], atol=1e-4)
    p_rec = cam.backproject(uv, depth)
    np.testing.assert_allclose(np.asarray(p_rec), p_world, atol=1e-2)


def test_camera_batched_project():
    n = 4
    Rs = ScipyRot.random(n, random_state=2).as_matrix().astype(np.float32)
    ts = RNG.normal(size=(n, 3)).astype(np.float32)
    cams = PinholeCamera(
        pose=SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts)),
        cal=Cal3Bundler.create(jnp.full((n,), 500.0), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), jnp.zeros(n)),
    )
    p = jnp.asarray(RNG.normal(size=(n, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32))
    uv, z = cams.project(p)
    assert uv.shape == (n, 2) and z.shape == (n,)
