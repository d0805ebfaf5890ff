"""Production-path sharding: the SceneOptimizer's own two-view/BA code must
produce identical results with and without the device mesh (VERDICT round-1
item 3 — the dryrun and the production path share the same code now)."""

import numpy as np
import pytest

from gtsfm_tpu.scene.scene_optimizer import SceneOptimizer, SceneOptimizerOptions


class _SyntheticLoader:
    """Tiny ring-scene loader (no disk)."""

    def __init__(self, n=5, res=96):
        self.n = n
        self.res = res
        rng = np.random.default_rng(0)
        self._images = rng.uniform(0.2, 0.8, (n, res, res)).astype(np.float32)
        # add trackable blobs
        for i in range(n):
            for _ in range(30):
                y, x = rng.integers(8, res - 8, 2)
                self._images[i, y - 2 : y + 2, x - 2 : x + 2] = rng.uniform()

    def __len__(self):
        return self.n

    def load_grayscale_batch(self, indices=None, pad_to=None):
        idx = list(indices) if indices is not None else list(range(self.n))
        return self._images[idx], [(self.res, self.res)] * len(idx)

    def get_all_intrinsics(self):
        from gtsfm_tpu.geometry import Cal3Bundler
        import jax.numpy as jnp

        return [
            Cal3Bundler.create(
                jnp.asarray(100.0), jnp.asarray(0.0), jnp.asarray(0.0),
                jnp.asarray(48.0), jnp.asarray(48.0),
            )
            for _ in range(self.n)
        ]

    def get_gt_poses(self):
        return None

    def image_filenames(self):
        return [f"im{i}.png" for i in range(self.n)]


def _two_view_outputs(use_mesh: bool):
    opts = SceneOptimizerOptions(use_mesh=use_mesh, pair_batch_size=8)
    so = SceneOptimizer(opts)
    loader = _SyntheticLoader()
    images, sizes = loader.load_grayscale_batch()
    kp_xy, kp_mask, descs = so._detect_batch(images, sizes)
    from gtsfm_tpu.loader.base import batch_calibrations

    cal = batch_calibrations(loader.get_all_intrinsics())
    pairs = np.array([(i, j) for i in range(5) for j in range(i + 1, 5)], np.int32)
    return so, so._run_two_view(pairs, kp_xy, kp_mask, descs, cal)


def test_two_view_identical_with_and_without_mesh(devices8):
    so_mesh, tvr_mesh = _two_view_outputs(use_mesh=True)
    assert so_mesh._mesh is not None, "mesh must be constructed with 8 devices"
    so_none, tvr_none = _two_view_outputs(use_mesh=False)
    assert so_none._mesh is None
    for k in tvr_mesh:
        np.testing.assert_allclose(
            np.asarray(tvr_mesh[k], np.float32),
            np.asarray(tvr_none[k], np.float32),
            atol=1e-5,
            err_msg=f"field {k} differs between sharded and unsharded runs",
        )


def test_ba_identical_with_and_without_mesh(devices8):
    import jax.numpy as jnp

    from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
    from gtsfm_tpu.parallel.sharding import make_mesh
    from tests.common.test_sfm_data import make_synthetic_scene

    data = make_synthetic_scene(n_cams=4, n_tracks=30, noise=0.5)
    fixed = jnp.zeros(4, bool).at[0].set(True)
    opts = BAOptions(max_iterations=5, cg_iterations=10)
    out_plain, m_plain = BundleAdjustment(opts).run(data, fixed_cam=fixed)
    out_mesh, m_mesh = BundleAdjustment(opts, mesh=make_mesh(8)).run(data, fixed_cam=fixed)
    np.testing.assert_allclose(m_mesh["final_cost"], m_plain["final_cost"], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_mesh.poses.t), np.asarray(out_plain.poses.t), atol=1e-4
    )


def test_ba_mesh_pads_uneven_measurements(devices8):
    """Measurement counts not divisible by the data axis must be padded, not
    crash, and padding must not change the solution."""
    import jax.numpy as jnp

    from gtsfm_tpu.bundle.ba import BAOptions, BundleAdjustment
    from gtsfm_tpu.parallel.sharding import make_mesh
    from tests.common.test_sfm_data import make_synthetic_scene

    data = make_synthetic_scene(n_cams=4, n_tracks=30, noise=0.5)
    # drop one measurement so M % 4 != 0
    mm = np.asarray(data.meas_mask).copy()
    keep = np.ones(len(mm), bool)
    keep[-1] = False
    data = data.replace(
        meas_cam=data.meas_cam[jnp.asarray(keep)],
        meas_track=data.meas_track[jnp.asarray(keep)],
        meas_uv=data.meas_uv[jnp.asarray(keep)],
        meas_mask=data.meas_mask[jnp.asarray(keep)],
    )
    M = int(data.meas_cam.shape[0])
    mesh = make_mesh(8)
    if M % mesh.shape["data"] == 0:
        pytest.skip("measurement count accidentally divisible")
    fixed = jnp.zeros(4, bool).at[0].set(True)
    opts = BAOptions(max_iterations=3, cg_iterations=8)
    out_plain, m_plain = BundleAdjustment(opts).run(data, fixed_cam=fixed)
    out_mesh, m_mesh = BundleAdjustment(opts, mesh=mesh).run(data, fixed_cam=fixed)
    np.testing.assert_allclose(m_mesh["final_cost"], m_plain["final_cost"], rtol=1e-4)


def test_maybe_init_distributed_wiring(monkeypatch):
    """maybe_init_distributed forwards the CLI coordinator args into
    jax.distributed.initialize and is a no-op when not configured
    (multi-host DCN bring-up, reference runner.py:337-345; execution on
    real multi-host deferred until >1 host exists)."""
    import argparse

    import jax

    from gtsfm_tpu.runner import maybe_init_distributed

    ns = argparse.Namespace(
        distributed_coordinator=None,
        distributed_num_processes=None,
        distributed_process_id=None,
    )
    assert maybe_init_distributed(ns) is False

    calls = {}

    def fake_init(coordinator_address, num_processes, process_id):
        calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    ns = argparse.Namespace(
        distributed_coordinator="10.0.0.1:8476",
        distributed_num_processes=4,
        distributed_process_id=2,
    )
    assert maybe_init_distributed(ns) is True
    assert calls == {"addr": "10.0.0.1:8476", "n": 4, "pid": 2}
