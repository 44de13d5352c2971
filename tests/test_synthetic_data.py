"""Motion-rich synthetic dataset: determinism of the cached generators
and train/held-out sequence disjointness (clamp de-circularization
evidence depends on both — PERF_NOTES round 3)."""
import numpy as np

from realvsr_tpu.data.synthetic import (_degrade_realistic, _lq_frame,
                                        _motion_frame)


def test_motion_frame_cache_transparent():
    a = _motion_frame(7, 2, 64, 64)
    _motion_frame.cache_clear()
    b = _motion_frame(7, 2, 64, 64)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32 and a.shape == (64, 64, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_lq_frame_matches_uncached_composition():
    _lq_frame.cache_clear()
    got = _lq_frame(7, 2, 64, 64)
    want = _degrade_realistic(_motion_frame(7, 2, 64, 64),
                              np.random.default_rng(7 * 1000 + 2))
    np.testing.assert_array_equal(got, want)


def test_motion_has_real_displacement():
    # consecutive frames of a motion-rich sequence must differ
    # substantially (the round-2 drifting-sinusoid clips moved <1 px —
    # the whole point of this generator is real-video-like motion)
    f0 = _motion_frame(3, 0, 96, 96)
    f1 = _motion_frame(3, 1, 96, 96)
    assert np.abs(f1 - f0).mean() > 0.005


def test_heldout_sequences_disjoint_from_training():
    # validation uses seq ids >= 100; training configs use num_seqs <= 24
    # starting at 0 — the generators must actually produce different
    # content for different seq ids
    tr = _motion_frame(0, 0, 64, 64)
    ho = _motion_frame(100, 0, 64, 64)
    assert np.abs(tr - ho).mean() > 0.01
