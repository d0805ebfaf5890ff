import jax
import jax.numpy as jnp
import numpy as np

from gtsfm_tpu.geometry import so3
from gtsfm_tpu.geometry.sim3 import Sim3
from gtsfm_tpu.splat.gs_data import GSData
from gtsfm_tpu.splat.merge import merge_gaussian_splats, transform_splats


def test_transform_splats_scales_and_rotates():
    g = GSData.from_points(np.asarray([[1.0, 0, 0]], np.float32), max_gaussians=2)
    S = Sim3(R=so3.expmap(jnp.asarray([0, 0, np.pi / 2])), t=jnp.zeros(3), s=jnp.asarray(2.0))
    out = transform_splats(g, S)
    np.testing.assert_allclose(np.asarray(out.means)[0], [0, 2, 0], atol=1e-5)
    assert np.allclose(
        np.exp(np.asarray(out.log_scales)[0]), 2 * np.exp(np.asarray(g.log_scales)[0]), rtol=1e-5
    )


def test_merge_dedups_overlaps():
    pts_a = np.asarray([[0, 0, 0], [1, 0, 0]], np.float32)
    pts_b = np.asarray([[0, 0, 0.001], [5, 5, 5]], np.float32)  # first overlaps a[0]
    a = GSData.from_points(pts_a)
    b = GSData.from_points(pts_b)
    merged = merge_gaussian_splats(a, b, Sim3.identity(), dedup_radius_factor=0.5)
    assert merged.num_alive() == 3  # one b splat deduped
