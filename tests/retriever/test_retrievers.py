import numpy as np

from gtsfm_tpu.retriever.retrievers import (
    ExhaustiveRetriever,
    JointSimilaritySequentialRetriever,
    RetrieverOptions,
    SequentialRetriever,
    SimilarityRetriever,
    exhaustive_pairs,
    sequential_pairs,
)


def test_sequential_pairs():
    pairs = sequential_pairs(5, 2)
    expected = {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}
    assert {tuple(p) for p in pairs} == expected


def test_exhaustive_pairs():
    pairs = exhaustive_pairs(4)
    assert len(pairs) == 6
    assert all(p[0] < p[1] for p in pairs)


def test_similarity_retriever():
    rng = np.random.default_rng(0)
    # two clusters of similar descriptors
    base1 = rng.normal(size=64).astype(np.float32)
    base2 = rng.normal(size=64).astype(np.float32)
    descs = np.stack(
        [base1 + 0.1 * rng.normal(size=64) for _ in range(4)]
        + [base2 + 0.1 * rng.normal(size=64) for _ in range(4)]
    ).astype(np.float32)
    r = SimilarityRetriever(RetrieverOptions(num_matched=3, min_score=0.5))
    pairs = r.get_image_pairs(8, descs)
    assert r.latest_similarity_matrix.shape == (8, 8)
    # pairs should stay within clusters
    for i, j in pairs:
        assert (i < 4) == (j < 4), f"cross-cluster pair {(i, j)}"
    # every image should be paired within its cluster
    seen = set(np.asarray(pairs).reshape(-1).tolist())
    assert seen == set(range(8))


def test_joint_retriever_includes_sequential():
    rng = np.random.default_rng(1)
    descs = rng.normal(size=(6, 32)).astype(np.float32)
    r = JointSimilaritySequentialRetriever(RetrieverOptions(max_frame_lookahead=1, num_matched=2, min_score=0.99))
    pairs = {tuple(p) for p in r.get_image_pairs(6, descs)}
    for i in range(5):
        assert (i, i + 1) in pairs


def test_sequential_retriever_class():
    r = SequentialRetriever(RetrieverOptions(max_frame_lookahead=3))
    pairs = r.get_image_pairs(10)
    assert len(pairs) == 7 + 7 + 7 + 3  # 9+8+7 windowed... just sanity:
    assert all(p[1] - p[0] <= 3 for p in pairs)


def test_retrievers_respect_loader_pair_validity():
    """Loaders with temporal/benchmark pair restrictions (is_valid_pair)
    filter every retriever's output."""
    from gtsfm_tpu.retriever.retrievers import (
        ExhaustiveRetriever,
        RetrieverOptions,
        SequentialRetriever,
    )

    class LookaheadLoader:
        def __len__(self):
            return 6

        def is_valid_pair(self, i, j):
            return 0 <= i < j < 6 and j - i <= 2

    L = LookaheadLoader()
    ex = ExhaustiveRetriever().get_image_pairs(6, loader=L)
    assert all(j - i <= 2 for i, j in ex)
    assert len(ex) == 4 + 3 + 2  # lookahead-2 band over 6 nodes: 5+4 = 9
    seq = SequentialRetriever(RetrieverOptions(max_frame_lookahead=5)).get_image_pairs(6, loader=L)
    assert all(j - i <= 2 for i, j in seq)
    # without a loader nothing is filtered
    assert len(ExhaustiveRetriever().get_image_pairs(6)) == 15
