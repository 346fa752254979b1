"""Property tests for the frame/subframe index math (randomized)."""

import numpy as np
import pytest

from muscle_synergies_tpu import SamplingFreq
from muscle_synergies_tpu.frames import ForcesEMGFrameTracker, TrajFrameTracker

RNG = np.random.default_rng(99)


def _random_sampling_freqs(n=25):
    out = []
    for _ in range(n):
        slow = int(RNG.integers(10, 500))
        ratio = int(RNG.integers(1, 30))
        frames = int(RNG.integers(1, 2000))
        out.append(SamplingFreq(slow * ratio, slow, frames))
    return out


@pytest.mark.parametrize("sf", _random_sampling_freqs())
def test_fast_round_trip_everywhere(sf):
    tracker = ForcesEMGFrameTracker(sf)
    total = sf.num_frames * sf.num_subframes
    assert tracker.final_index == total - 1
    for index in RNG.integers(0, total, size=20):
        pair = tracker.to_framesubfr(int(index))
        assert tracker.to_index(pair) == index
        frame, sub = pair
        assert 1 <= frame <= sf.num_frames
        assert 0 <= sub < sf.num_subframes


@pytest.mark.parametrize("sf", _random_sampling_freqs(10))
def test_slow_round_trip_everywhere(sf):
    tracker = TrajFrameTracker(sf)
    for index in RNG.integers(0, sf.num_frames, size=20):
        pair = tracker.to_framesubfr(int(index))
        assert pair[1] == 0
        assert tracker.to_index(pair) == index


@pytest.mark.parametrize("sf", _random_sampling_freqs(10))
def test_fast_index_is_monotone_in_time(sf):
    tracker = ForcesEMGFrameTracker(sf)
    pairs = [
        (int(f), int(s))
        for f in RNG.integers(1, sf.num_frames + 1, size=15)
        for s in RNG.integers(0, sf.num_subframes, size=2)
    ]
    pairs.sort()
    indices = [tracker.to_index(p) for p in pairs]
    assert indices == sorted(indices)


def test_vectorized_matches_scalar():
    sf = SamplingFreq(2000, 100, 500)
    tracker = ForcesEMGFrameTracker(sf)
    frames = RNG.integers(1, 501, size=100)
    subs = RNG.integers(0, 20, size=100)
    vec = tracker.index_array(frames, subs)
    scalar = np.array([tracker.to_index((int(f), int(s)))
                       for f, s in zip(frames, subs)])
    np.testing.assert_array_equal(vec, scalar)


def test_out_of_range_everywhere():
    sf = SamplingFreq(300, 100, 10)
    fast = ForcesEMGFrameTracker(sf)
    for bad in [(0, 0), (11, 0), (5, 3), (5, -1), (-3, 1)]:
        with pytest.raises(IndexError):
            fast.to_index(bad)
    with pytest.raises(IndexError):
        fast.to_framesubfr(30)
    with pytest.raises(IndexError):
        fast.to_framesubfr(-1)


def test_non_integer_ratio_rejected():
    with pytest.raises(ValueError, match="integer multiple"):
        SamplingFreq(250, 100, 5).num_subframes
