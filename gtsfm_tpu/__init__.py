"""gtsfm_tpu — a TPU-native Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of borglab/gtsfm
(reference layer map in /root/repo/SURVEY.md): global SfM with retrieval,
deep/classical front-ends, rotation/translation averaging, track formation,
triangulation, block-sparse bundle adjustment, hierarchical cluster merging,
metrics and COLMAP-format IO — expressed as batched, padded, jit-compiled
device pipelines instead of a Dask task graph.
"""

__version__ = "0.1.0"
