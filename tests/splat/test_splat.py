import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import SE3
from gtsfm_tpu.splat.gs_data import GSData, export_ply, load_ply
from gtsfm_tpu.splat.rendering import bspline_camera_path, render


def _camera(H=64, W=64, f=80.0):
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    wTc = SE3.identity()  # camera at origin looking +z
    return wTc, K


def _single_gaussian(xyz=(0.0, 0.0, 4.0), color=(0.9, 0.2, 0.2), scale=0.2, opacity=0.9):
    g = GSData.from_points(np.asarray([xyz], np.float32), max_gaussians=4)
    cols = np.zeros((4, 3), np.float32)
    c = np.clip(np.asarray(color), 1e-3, 1 - 1e-3)
    cols[0] = np.log(c / (1 - c))
    return g.replace(
        colors=jnp.asarray(cols),
        log_scales=jnp.full((4, 3), np.log(scale)),
        opacity_logit=jnp.full(4, np.log(opacity / (1 - opacity))),
    )


def test_render_single_gaussian_centered():
    wTc, K = _camera()
    g = _single_gaussian()
    img, alpha = render(g, wTc, K, 64, 64)
    img = np.asarray(img)
    # brightest pixel at the projected center (32, 32); red-dominant
    cy, cx = np.unravel_index(np.argmax(img[..., 0]), (64, 64))
    assert abs(cy - 32) <= 1 and abs(cx - 32) <= 1
    assert img[32, 32, 0] > 0.5 > img[32, 32, 1]
    # alpha fades away from the center
    assert np.asarray(alpha)[32, 32] > 0.5
    assert np.asarray(alpha)[2, 2] < 0.05


def test_render_depth_ordering():
    """A near red gaussian should occlude a far green one on the same ray."""
    wTc, K = _camera()
    g = GSData.from_points(np.asarray([[0, 0, 3.0], [0, 0, 6.0]], np.float32), max_gaussians=4)
    cols = np.zeros((4, 3), np.float32)
    cols[0] = [5.0, -5.0, -5.0]  # red, near
    cols[1] = [-5.0, 5.0, -5.0]  # green, far
    g = g.replace(
        colors=jnp.asarray(cols),
        log_scales=jnp.full((4, 3), np.log(0.25)),
        opacity_logit=jnp.full(4, 4.0),  # ~0.98 alpha
    )
    img, _ = render(g, wTc, K, 64, 64)
    center = np.asarray(img)[32, 32]
    assert center[0] > 0.8 and center[1] < 0.2


def test_render_differentiable():
    wTc, K = _camera()
    g = _single_gaussian()

    def loss(means):
        img, _ = render(g.replace(means=means), wTc, K, 64, 64)
        return jnp.sum(img[:, :32])  # mass in the left half

    grad = jax.grad(loss)(g.means)
    assert not np.any(np.isnan(np.asarray(grad)))
    # moving the gaussian left (-x) increases left-half mass
    assert float(grad[0, 0]) < 0


def test_ply_roundtrip(tmp_path):
    g = _single_gaussian()
    p = tmp_path / "splats.ply"
    export_ply(g, str(p))
    g2 = load_ply(str(p))
    assert g2.max_gaussians == 1  # only alive exported
    np.testing.assert_allclose(np.asarray(g2.means)[0], [0, 0, 4.0], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(g2.colors))[0], [0.9, 0.2, 0.2], atol=1e-3
    )


def test_bspline_path():
    n = 5
    t = np.stack([np.linspace(0, 4, n), np.zeros(n), np.zeros(n)], -1).astype(np.float32)
    poses = SE3(R=jnp.tile(jnp.eye(3), (n, 1, 1)), t=jnp.asarray(t))
    path = bspline_camera_path(poses, 20)
    pt = np.asarray(path.t)
    assert pt.shape == (20, 3)
    assert np.all(np.diff(pt[:, 0]) > -1e-4)  # monotone along the line
    assert abs(pt[0, 0] - 0) < 0.3 and abs(pt[-1, 0] - 4) < 0.3


def test_training_improves_l1():
    """Fit a few gaussians to views of a synthetic 3-gaussian scene."""
    from gtsfm_tpu.common.sfm_data import SfmData
    from gtsfm_tpu.geometry import Cal3_S2
    from gtsfm_tpu.splat.gaussian_splatting import GaussianSplatting, GSTrainOptions

    H = W = 48
    f = 60.0
    n_cams = 3
    # GT scene: 3 colored gaussians
    gt_pts = np.asarray([[0, 0, 4], [0.7, 0.3, 4.5], [-0.6, -0.2, 3.5]], np.float32)
    gt = GSData.from_points(gt_pts, max_gaussians=4)
    cols = np.zeros((4, 3), np.float32)
    cols[0] = [4, -4, -4]
    cols[1] = [-4, 4, -4]
    cols[2] = [-4, -4, 4]
    gt = gt.replace(colors=jnp.asarray(cols), log_scales=jnp.full((4, 3), np.log(0.3)),
                    opacity_logit=jnp.full(4, 3.0))
    Rs = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    ts = np.asarray([[0, 0, 0], [0.4, 0, 0], [-0.4, 0.1, 0]], np.float32)
    poses = SE3(R=jnp.asarray(Rs), t=jnp.asarray(ts))
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    imgs = []
    for i in range(n_cams):
        img, _ = render(gt, SE3(R=poses.R[i], t=poses.t[i]), K, H, W)
        imgs.append(np.asarray(img))
    imgs = np.stack(imgs)

    cal = Cal3_S2.create(jnp.full(n_cams, f), jnp.full(n_cams, f), jnp.zeros(n_cams),
                         jnp.full(n_cams, W / 2), jnp.full(n_cams, H / 2))
    data = SfmData.from_cameras_and_tracks(
        poses, cal,
        [(p, [(0, np.zeros(2, np.float32)), (1, np.zeros(2, np.float32))]) for p in gt_pts],
        num_cameras=n_cams,
    )
    trainer = GaussianSplatting(GSTrainOptions(iterations=120, densify_every=1000, chunk=16))
    gs, metrics = trainer.train(data, imgs)
    assert metrics["final_l1"] < metrics["initial_l1"] * 0.7, metrics
