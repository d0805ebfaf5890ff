import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from gtsfm_tpu.frontend.detectors.dog_sift import DoGSift, DoGSiftOptions
from gtsfm_tpu.frontend.matchers.mutual_nn import match_descriptors


def _test_image(h=160, w=160, seed=0):
    """Smooth random blob image with corners/texture."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(size=(h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))  # blocky = corners
    img = ndi.gaussian_filter(img, 1.0)
    return img


OPTS = DoGSiftOptions(max_keypoints=256, num_octaves=3, contrast_threshold=0.01)


def test_detects_keypoints():
    img = _test_image()
    det = DoGSift(OPTS)
    kps, desc = det(jnp.asarray(img))
    n = int(np.asarray(kps.mask).sum())
    assert n > 50, f"only {n} keypoints"
    assert desc.shape == (256, 128)
    c = np.asarray(kps.coordinates)[np.asarray(kps.mask)]
    assert c[:, 0].max() < 160 and c[:, 1].max() < 160 and c.min() >= 0
    # descriptors are L2-normalized
    d = np.asarray(desc)[np.asarray(kps.mask)]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_repeatability_under_shift():
    img = _test_image(seed=1)
    shift = 6
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    det = DoGSift(OPTS)
    kps1, d1 = det(jnp.asarray(img))
    kps2, d2 = det(jnp.asarray(img2))
    idx, mmask, _ = match_descriptors(d1, d2, kps1.mask, kps2.mask, use_bf16=False)
    idx = np.asarray(idx)
    mmask = np.asarray(mmask)
    assert mmask.sum() > 20, f"only {mmask.sum()} matches"
    c1 = np.asarray(kps1.coordinates)
    c2 = np.asarray(kps2.coordinates)
    # matched keypoints should be displaced by exactly (shift, shift)
    disp = c2[idx[mmask]] - c1[mmask]
    good = np.abs(disp - shift).max(axis=1) < 2.0
    assert good.mean() > 0.8, f"only {good.mean():.2f} correct under shift"


def test_blank_image_no_keypoints():
    det = DoGSift(OPTS)
    kps, desc = det(jnp.zeros((160, 160)))
    assert int(np.asarray(kps.mask).sum()) == 0
    assert not np.any(np.isnan(np.asarray(desc)))


def test_deterministic():
    img = _test_image(seed=2)
    det = DoGSift(OPTS)
    k1, d1 = det(jnp.asarray(img))
    k2, d2 = det(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(k1.coordinates), np.asarray(k2.coordinates))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
