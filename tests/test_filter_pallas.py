"""Interpret-mode parity of the fused Pallas filtfilt kernel vs scipy.

The chunks-on-lanes cascade kernel must reproduce
``scipy.signal.sosfiltfilt``/``sosfilt`` exactly (float64 here; on TPU
the same program runs float32 and is *more* accurate than the blocked
scan, since the in-VMEM recurrence accumulates less reordering error).
"""

import numpy as np
import pytest
from scipy import signal as sps

from muscle_synergies_tpu.ops.filter_pallas import (
    cascade_pallas,
    pallas_eligible,
    sosfiltfilt_pallas,
)
from muscle_synergies_tpu.ops.filters import sosfiltfilt

RNG = np.random.default_rng(11)


def _sig(n, c):
    return RNG.standard_normal((n, c))


DESIGNS = [
    dict(n=5000, c=3, order=4, fs=100.0, fc=10.0),
    dict(n=4096, c=8, order=13, fs=2000.0, fc=4.0),  # tutorial envelope
    dict(n=3000, c=1, order=2, fs=100.0, fc=5.0),
    dict(n=2500, c=9, order=3, fs=1000.0, fc=40.0),  # force-plate width
    dict(n=2048, c=16, order=5, fs=500.0, fc=60.0),
]


@pytest.mark.parametrize("design", DESIGNS)
def test_filtfilt_matches_scipy(design):
    x = _sig(design["n"], design["c"])
    sos = sps.butter(
        design["order"], design["fc"], output="sos", fs=design["fs"]
    )
    mine = np.asarray(sosfiltfilt_pallas(sos, x, interpret=True))
    ref = sps.sosfiltfilt(sos, x, axis=0)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-9 * scale)


def test_cascade_matches_scipy_sosfilt():
    x = _sig(3000, 4)
    sos = sps.butter(6, 20.0, output="sos", fs=500.0)
    zi = sps.sosfilt_zi(sos)[:, :, None] * x[0]
    ref, _ = sps.sosfilt(sos, x, axis=0, zi=zi)
    mine = np.asarray(cascade_pallas(sos, x, zi, interpret=True))
    np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-12)


def test_cascade_zero_zi():
    x = _sig(2000, 2)
    sos = sps.butter(4, 10.0, output="sos", fs=100.0)
    ref = sps.sosfilt(sos, x, axis=0)
    zi = np.zeros((sos.shape[0], 2, 2))
    mine = np.asarray(cascade_pallas(sos, x, zi, interpret=True))
    np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("padtype", ["even", "constant", None])
def test_padtype_variants(padtype):
    x = _sig(2000, 2)
    sos = sps.butter(4, 10.0, output="sos", fs=100.0)
    mine = np.asarray(sosfiltfilt_pallas(sos, x, padtype=padtype, interpret=True))
    ref = sps.sosfiltfilt(sos, x, axis=0, padtype=padtype)
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-10)


def test_explicit_padlen_and_1d():
    x = _sig(1500, 1)[:, 0]
    sos = sps.butter(4, 10.0, output="sos", fs=100.0)
    mine = np.asarray(sosfiltfilt_pallas(sos, x, padlen=64, interpret=True))
    ref = sps.sosfiltfilt(sos, x, padlen=64)
    assert mine.ndim == 1
    np.testing.assert_allclose(mine, ref, rtol=1e-9, atol=1e-10)


def test_matches_scan_implementation():
    x = _sig(3000, 8)
    sos = sps.butter(13, 4.0, output="sos", fs=2000.0)
    scan = np.asarray(sosfiltfilt(sos, x, impl="scan"))
    pal = np.asarray(sosfiltfilt_pallas(sos, x, interpret=True))
    # both are ~1e-11 from scipy on this near-unit-pole cascade but
    # reorder floats differently; compare at the common accuracy scale
    scale = np.max(np.abs(scan))
    np.testing.assert_allclose(pal, scan, rtol=1e-5, atol=1e-8 * scale)


def test_vmapped_over_trials():
    # the batched envelope path vmaps the kernel over a trial axis
    import jax

    xs = np.stack([_sig(2000, 4) for _ in range(3)])
    sos = sps.butter(4, 10.0, output="sos", fs=100.0)
    batched = np.asarray(
        jax.vmap(lambda x: sosfiltfilt_pallas(sos, x, interpret=True))(
            np.asarray(xs)
        )
    )
    for b in range(3):
        ref = sps.sosfiltfilt(sos, xs[b], axis=0)
        np.testing.assert_allclose(batched[b], ref, rtol=1e-9, atol=1e-10)


def test_short_signal_rejected():
    sos = sps.butter(4, 10.0, output="sos", fs=100.0)
    with pytest.raises(ValueError, match="padlen"):
        sosfiltfilt_pallas(sos, np.ones((5, 2)), interpret=True)


def test_bad_padtype_rejected():
    sos = sps.butter(4, 10.0, output="sos", fs=100.0)
    with pytest.raises(ValueError, match="padtype"):
        sosfiltfilt_pallas(sos, np.ones((500, 2)), padtype="reflect")


def test_too_many_channels_rejected():
    sos = sps.butter(2, 10.0, output="sos", fs=100.0)
    with pytest.raises(ValueError, match="channels"):
        sosfiltfilt_pallas(sos, np.ones((500, 200)), interpret=True)


def test_eligibility_gate():
    import jax.numpy as jnp

    # CPU backend in the test suite -> never eligible, auto falls back
    assert not pallas_eligible(jnp.zeros((1000, 8), jnp.float32), 45)
    x = _sig(2000, 3)
    sos = sps.butter(4, 10.0, output="sos", fs=100.0)
    auto = np.asarray(sosfiltfilt(sos, x, impl="auto"))
    scan = np.asarray(sosfiltfilt(sos, x, impl="scan"))
    np.testing.assert_array_equal(auto, scan)
    with pytest.raises(ValueError, match="impl"):
        sosfiltfilt(sos, x, impl="fft")
