"""Reproducibility tests: nondeterminism-prone components run N times must
produce identical results.

Parity: /root/reference/tests/repro_tests/test_repro_base.py:8-43
(ReproducibilityTestBase, 10x identical) covering detectors, verifiers,
averaging.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

N_REPS = 5  # reference uses 10; 5 keeps CI time sane with same guarantees


def _assert_all_identical(results, cmp=np.testing.assert_array_equal):
    for r in results[1:]:
        cmp(results[0], r)


def test_dog_sift_repro():
    from gtsfm_tpu.frontend.detectors.dog_sift import DoGSift, DoGSiftOptions

    det = DoGSift(DoGSiftOptions(max_keypoints=128, num_octaves=2))
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(128, 128)).astype(np.float32))
    outs = [np.asarray(det(img)[1]) for _ in range(N_REPS)]
    _assert_all_identical(outs)


def test_ransac_repro():
    from gtsfm_tpu.frontend.verifiers.essential import RansacOptions, ransac_essential
    from tests.frontend.test_essential import _make_two_view

    _, _, x1, x2, _ = _make_two_view(n=100, outlier_frac=0.3, seed=0)
    outs = [
        np.asarray(
            ransac_essential(
                jnp.asarray(x1), jnp.asarray(x2), jnp.ones(100, bool),
                jax.random.PRNGKey(7), threshold=3e-3,
                opts=RansacOptions(num_hypotheses=64),
            )["i2Ri1"]
        )
        for _ in range(N_REPS)
    ]
    _assert_all_identical(outs)


def test_rotation_averaging_repro():
    from gtsfm_tpu.averaging.rotation.averaging import RotationAveraging
    from tests.averaging.test_rotation_averaging import _make_problem

    _, edges, i2Ri1 = _make_problem(n=8, noise_rad=0.01, seed=3)
    ra = RotationAveraging()
    outs = [ra.run(8, edges, i2Ri1)[0] for _ in range(N_REPS)]
    _assert_all_identical(outs)


def test_translation_averaging_repro():
    from gtsfm_tpu.averaging.translation.averaging import TranslationAveraging
    from tests.averaging.test_translation_averaging import _make_problem

    wRi, _, edges, i2Ui1 = _make_problem(n=8, noise=0.01, seed=4)
    ta = TranslationAveraging()
    outs = [ta.run(8, edges, i2Ui1, wRi)[0] for _ in range(N_REPS)]
    _assert_all_identical(outs)


def test_triangulation_repro():
    from gtsfm_tpu.bundle.triangulation import triangulate_tracks
    from tests.bundle.test_triangulation import _scene_track_arrays
    from tests.common.test_sfm_data import make_synthetic_scene

    data = make_synthetic_scene(n_cams=4, n_tracks=10)
    cam_idx, uv, mask = _scene_track_arrays(data)
    outs = [
        np.asarray(
            triangulate_tracks(
                data.poses, data.cal, cam_idx, uv, mask, jax.random.PRNGKey(0),
                num_hypotheses=16,
            )[0]
        )
        for _ in range(N_REPS)
    ]
    _assert_all_identical(outs)


def test_ba_repro():
    from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
    from tests.bundle.test_ba import _perturb
    from tests.common.test_sfm_data import make_synthetic_scene

    noisy = _perturb(make_synthetic_scene(n_cams=4, n_tracks=15))
    ba = BundleAdjustment(BAOptions(max_iterations=5))
    fixed = jnp.zeros(4, bool).at[0].set(True)
    outs = [np.asarray(ba.run(noisy, fixed_cam=fixed)[0].points) for _ in range(N_REPS)]
    _assert_all_identical(outs)
