"""Multi-chip sharding for the batched SfM pipelines.

The reference scales by scattering per-pair Dask tasks over CPU/GPU workers
(runner.py:313-446, two_view_estimator.py:846-886). The TPU-native
equivalent: ONE jit-compiled program sharded over a jax.sharding.Mesh —
the pair axis is data-parallel (ICI all-gather/reduce inserted by XLA),
the keypoint/similarity axes are model-parallel for the matcher matmul,
and BA's measurement axis is data-parallel with psum-reduced camera/track
blocks. Multi-host runs extend the same mesh over DCN via jax.distributed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_model_split: bool = True) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    data axis: pair / measurement batch parallelism (dp)
    model axis: keypoint-axis parallelism inside the matcher (tp/sp analog)
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if data_model_split and n >= 4 and n % 2 == 0:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    mesh_devs = mesh_utils.create_device_mesh(shape, devices=devs)
    return Mesh(mesh_devs, ("data", "model"))


def shard_pair_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a two-view pair batch onto the mesh: pair axis over 'data',
    keypoint axis of descriptors over 'model'."""
    pair_sharded = NamedSharding(mesh, P("data"))
    pair_kp = NamedSharding(mesh, P("data", "model"))

    def place(name, arr):
        if name in ("desc1", "desc2"):
            return jax.device_put(arr, pair_kp)
        if hasattr(arr, "ndim"):
            return jax.device_put(arr, pair_sharded)
        return arr

    out = {}
    for k, v in batch.items():
        if k in ("cal1", "cal2"):
            out[k] = jax.tree.map(lambda a: jax.device_put(a, pair_sharded), v)
        else:
            out[k] = place(k, v)
    return out


def shard_ba_problem(mesh: Mesh, prob):
    """Place a BAProblem: measurements over 'data', cameras/points replicated
    (camera & point blocks are reduced with psum-like segment sums)."""
    meas = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place_meas(a):
        return jax.device_put(a, meas)

    def place_repl(a):
        return jax.device_put(a, repl)

    return prob.replace(
        poses=jax.tree.map(place_repl, prob.poses),
        cal=jax.tree.map(place_repl, prob.cal),
        cal_params=place_repl(prob.cal_params),
        points=place_repl(prob.points),
        meas_cam=place_meas(prob.meas_cam),
        meas_track=place_meas(prob.meas_track),
        meas_uv=place_meas(prob.meas_uv),
        meas_w=place_meas(prob.meas_w),
        fixed_cam=place_repl(prob.fixed_cam),
    )
