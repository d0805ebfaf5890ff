"""gtsfm_tpu — a TPU-native Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of borglab/gtsfm
(reference layer map in /root/repo/SURVEY.md): global SfM with retrieval,
deep/classical front-ends, rotation/translation averaging, track formation,
triangulation, block-sparse bundle adjustment, hierarchical cluster merging,
metrics and COLMAP-format IO — expressed as batched, padded, jit-compiled
device pipelines instead of a Dask task graph.
"""

__version__ = "0.1.0"


# Convenience re-exports (lazy — keep import light for tooling)
def __getattr__(name):
    lazy = {
        "SfmData": ("gtsfm_tpu.common.sfm_data", "SfmData"),
        "SceneOptimizer": ("gtsfm_tpu.scene.scene_optimizer", "SceneOptimizer"),
        "SceneOptimizerOptions": ("gtsfm_tpu.scene.scene_optimizer", "SceneOptimizerOptions"),
        "MultiViewOptimizer": ("gtsfm_tpu.scene.mvo", "MultiViewOptimizer"),
        "BundleAdjustment": ("gtsfm_tpu.bundle.ba", "BundleAdjustment"),
        "SE3": ("gtsfm_tpu.geometry", "SE3"),
        "Sim3": ("gtsfm_tpu.geometry", "Sim3"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
