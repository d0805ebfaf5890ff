"""Image-pair retrieval: sequential, exhaustive, similarity, joint.

Parity: /root/reference/gtsfm/retriever/ (SequentialRetriever :21,
ExhaustiveRetriever, SimilarityRetriever :36-100 with blocked cosine
similarity + top-K + min-score, JointSimilaritySequentialRetriever).

The similarity matrix is one (N, D) x (D, N) device matmul — the
reference's 50x50 blocking exists to bound CPU memory; on TPU the full
matmul is the fast path (bf16 MXU) and XLA tiles it. The matrix is also
retained for diagnostics/bridge-reconnection, mirroring
SimilarityRetriever._latest_similarity_matrix.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RetrieverOptions(NamedTuple):
    num_matched: int = 5  # top-K per query (unified.yaml: 5)
    min_score: float = 0.3  # unified.yaml min_score
    max_frame_lookahead: int = 15  # sequential window


def filter_loader_valid(pairs: np.ndarray, loader) -> np.ndarray:
    """Drop pairs the loader declares invalid (temporal lookahead limits,
    benchmark co-visibility lists — LoaderBase.is_valid_pair). No-op when
    loader is None."""
    if loader is None or len(pairs) == 0:
        return pairs
    keep = [bool(loader.is_valid_pair(int(i), int(j))) for i, j in pairs]
    return pairs[np.asarray(keep, bool)].reshape(-1, 2)


def sequential_pairs(num_images: int, max_frame_lookahead: int) -> np.ndarray:
    """Sliding-window pairs (i, j), j - i <= lookahead. Parity:
    sequential_retriever.py:21."""
    pairs = [
        (i, j)
        for i in range(num_images)
        for j in range(i + 1, min(i + 1 + max_frame_lookahead, num_images))
    ]
    return np.array(pairs, np.int32).reshape(-1, 2)


def exhaustive_pairs(num_images: int) -> np.ndarray:
    pairs = [(i, j) for i in range(num_images) for j in range(i + 1, num_images)]
    return np.array(pairs, np.int32).reshape(-1, 2)


def similarity_matrix(descriptors: jnp.ndarray, use_bf16: bool = True) -> jnp.ndarray:
    """Cosine similarity (N, N) from global descriptors (N, D)."""
    d = descriptors / jnp.maximum(
        jnp.linalg.norm(descriptors, axis=-1, keepdims=True), 1e-12
    )
    if use_bf16:
        return jnp.dot(
            d.astype(jnp.bfloat16), d.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(d, d.T, precision=jax.lax.Precision.HIGHEST)


def pairs_from_similarity_matrix(
    sim, num_matched: int = 5, min_score: float = 0.3
) -> np.ndarray:
    """Top-K above-threshold pairs per query row of a precomputed
    similarity matrix (also the entry point for externally-produced
    matrices, e.g. the reference's saved netvlad_similarity_matrix.txt)."""
    sim = jnp.asarray(sim)
    n = sim.shape[0]
    sim = sim - 2.0 * jnp.eye(n, dtype=sim.dtype)  # exclude self
    scores, idx = jax.lax.top_k(sim, min(num_matched, n - 1) if n > 1 else 1)
    scores_np = np.asarray(scores)
    idx_np = np.asarray(idx)
    pairs = set()
    for i in range(n):
        for k in range(idx_np.shape[1]):
            j = int(idx_np[i, k])
            if scores_np[i, k] >= min_score and i != j:
                pairs.add((min(i, j), max(i, j)))
    return np.array(sorted(pairs), np.int32).reshape(-1, 2)


def similarity_pairs(
    descriptors: jnp.ndarray,
    num_matched: int = 5,
    min_score: float = 0.3,
) -> tuple:
    """Top-K above-threshold pairs per query. Returns (pairs (P, 2) np,
    sim_matrix np (retained for diagnostics / bridge reconnection))."""
    sim = similarity_matrix(descriptors)
    n = sim.shape[0]
    sim = sim - 2.0 * jnp.eye(n, dtype=sim.dtype)  # exclude self
    pairs = pairs_from_similarity_matrix(sim, num_matched, min_score)
    return pairs, np.asarray(sim)


class SequentialRetriever:
    def __init__(self, options: RetrieverOptions = RetrieverOptions()):
        self.options = options

    def get_image_pairs(self, num_images: int, global_descriptors=None, loader=None) -> np.ndarray:
        return filter_loader_valid(
            sequential_pairs(num_images, self.options.max_frame_lookahead), loader
        )


class ExhaustiveRetriever:
    def get_image_pairs(self, num_images: int, global_descriptors=None, loader=None) -> np.ndarray:
        return filter_loader_valid(exhaustive_pairs(num_images), loader)


class SimilarityRetriever:
    def __init__(self, options: RetrieverOptions = RetrieverOptions()):
        self.options = options
        self.latest_similarity_matrix: Optional[np.ndarray] = None

    def get_image_pairs(self, num_images: int, global_descriptors=None, loader=None) -> np.ndarray:
        if global_descriptors is None:
            raise ValueError("SimilarityRetriever requires global descriptors")
        pairs, sim = similarity_pairs(
            jnp.asarray(global_descriptors), self.options.num_matched, self.options.min_score
        )
        self.latest_similarity_matrix = sim
        return filter_loader_valid(pairs, loader)


class JointSimilaritySequentialRetriever:
    """Union of similarity and sequential pairs (the unified.yaml default)."""

    def __init__(self, options: RetrieverOptions = RetrieverOptions()):
        self.options = options
        self.similarity = SimilarityRetriever(options)

    def get_image_pairs(self, num_images: int, global_descriptors=None, loader=None) -> np.ndarray:
        seq = sequential_pairs(num_images, self.options.max_frame_lookahead)
        if global_descriptors is None:
            return filter_loader_valid(seq, loader)
        sim = self.similarity.get_image_pairs(num_images, global_descriptors)
        self.latest_similarity_matrix = self.similarity.latest_similarity_matrix
        all_pairs = {tuple(p) for p in seq} | {tuple(p) for p in sim}
        return filter_loader_valid(
            np.array(sorted(all_pairs), np.int32).reshape(-1, 2), loader
        )
