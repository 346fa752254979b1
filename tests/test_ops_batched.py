"""Batched masked preprocessing must equal per-trial processing."""

import numpy as np
import pytest

from muscle_synergies_tpu.models.batch import pad_and_stack
from muscle_synergies_tpu.ops import emg as single
from muscle_synergies_tpu.ops.batched import (
    linear_envelope_batch,
    moving_rms_batch,
    normalize_batch,
    time_normalize_batch,
    zero_center_batch,
)

RNG = np.random.default_rng(71)


@pytest.fixture(scope="module")
def ragged():
    trials = [RNG.standard_normal((n, 4)) for n in (120, 90, 150)]
    batch, mask = pad_and_stack(trials)
    return trials, batch, mask


def test_zero_center_matches_per_trial(ragged):
    trials, batch, mask = ragged
    out = np.asarray(zero_center_batch(batch, mask))
    for b, t in enumerate(trials):
        expected = np.asarray(single.zero_center(t))
        np.testing.assert_allclose(out[b, : len(t)], expected, atol=1e-12)
        np.testing.assert_array_equal(out[b, len(t):], 0)


def test_moving_rms_matches_per_trial(ragged):
    trials, batch, mask = ragged
    out = np.asarray(moving_rms_batch(batch, 8, mask))
    for b, t in enumerate(trials):
        expected = np.asarray(single.moving_rms(t, 8))
        np.testing.assert_allclose(out[b, : len(t)], expected, atol=1e-12)


def test_time_normalize_matches_per_trial(ragged):
    trials, batch, mask = ragged
    out = np.asarray(time_normalize_batch(batch, 50, mask))
    for b, t in enumerate(trials):
        expected = np.asarray(single.time_normalize(t, 50))
        np.testing.assert_allclose(out[b], expected, atol=1e-10)


def test_normalize_matches_per_trial(ragged):
    trials, batch, mask = ragged
    out = np.asarray(normalize_batch(batch, mask))
    for b, t in enumerate(trials):
        expected = np.asarray(single.normalize(t))
        np.testing.assert_allclose(out[b, : len(t)], expected, atol=1e-12)


def test_envelope_equal_length_matches_per_trial():
    trials = [RNG.standard_normal((200, 3)) for _ in range(4)]
    batch, mask = pad_and_stack(trials)
    out = np.asarray(
        linear_envelope_batch(
            batch, critical_freqs=5.0, sampling_frequency=100.0, order=4,
            mask=mask,
        )
    )
    for b, t in enumerate(trials):
        expected = np.asarray(
            single.linear_envelope(
                t, critical_freqs=5.0, sampling_frequency=100.0, order=4
            )
        )
        np.testing.assert_allclose(out[b], expected, rtol=1e-8, atol=1e-10)


def test_no_mask_paths(ragged):
    _, batch, _ = ragged
    assert zero_center_batch(batch).shape == batch.shape
    assert time_normalize_batch(batch, 30).shape == (3, 30, 4)


def test_moving_rms_batch_jittable_with_mask(ragged):
    """The public wrapper must stay traceable inside a caller's jit.

    Window validation needs concrete mask values, so it is skipped
    under tracing (round-2 advisor finding: the host-sync check raised
    TracerArrayConversionError from inside jax.jit).
    """
    import jax

    _, batch, mask = ragged
    eager = np.asarray(moving_rms_batch(batch, 8, mask))
    jitted = np.asarray(
        jax.jit(lambda xs, m: moving_rms_batch(xs, 8, m))(batch, mask)
    )
    np.testing.assert_allclose(jitted, eager, rtol=1e-6, atol=1e-9)


def test_moving_rms_batch_still_validates_eagerly(ragged):
    _, batch, mask = ragged
    with pytest.raises(ValueError, match="longer than the shortest"):
        moving_rms_batch(batch, 10_000, mask)


def test_moving_rms_batch_poisons_bad_window_under_jit(ragged):
    """Inside jit the length guard cannot raise: short trials go NaN."""
    import jax

    trials, _, _ = ragged
    batch, mask = pad_and_stack(trials)  # lengths 120/90/150
    out = np.asarray(
        jax.jit(lambda xs, m: moving_rms_batch(xs, 100, m))(batch, mask)
    )
    assert np.isnan(out[1]).all()      # 90-sample trial: window too long
    assert not np.isnan(out[0]).any()  # valid trials unaffected
    assert not np.isnan(out[2]).any()
