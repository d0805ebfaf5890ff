"""AOT pre-warm of the standard jit shape set (cluster bring-up)."""

from gtsfm_tpu.utils.prewarm import prewarm_standard_shapes


def test_prewarm_compiles_standard_set():
    timings = prewarm_standard_shapes(
        pair_batches=(4,),
        max_keypoints=64,
        desc_dim=16,
        hypotheses=32,
        ba_shapes=((4, 32, 128),),
        detector_hw=(64, 64),
        image_batch=2,
    )
    assert len(timings) == 3
    assert all(t >= 0 for t in timings.values())
