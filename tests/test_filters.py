"""Numerical parity of the JAX filter scans against scipy.

The associative-scan IIR implementation must reproduce
``scipy.signal.sosfilt``/``sosfiltfilt`` (the reference's compute
engine, analysis.py:404-418) to floating-point accuracy in float64.
"""

import numpy as np
import pytest
from scipy import signal as sps

from muscle_synergies_tpu.ops import (
    default_padlen,
    sos_design,
    sosfilt,
    sosfilt_zi,
    sosfiltfilt,
)

RNG = np.random.default_rng(42)


def _assert_close(mine, ref, rtol=1e-7):
    # Near-unit-circle poles amplify the float reordering of the
    # parallel scan; 1e-8 of the signal scale is still two orders
    # tighter than the framework's 1e-6 parity target.
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(mine, ref, rtol=rtol, atol=1e-8 * scale)


def _sig(n=512, c=3):
    return RNG.standard_normal((n, c))


# NOTE: compiles round-trip through a remote service in this sandbox,
# so designs are chosen to share XLA compile keys (same section count /
# pad length / input shape) wherever possible.
DESIGNS = [
    dict(order=4, critical_freqs=10.0, sampling_frequency=100.0),
    dict(order=2, critical_freqs=4.0, sampling_frequency=2000.0),
    dict(
        order=4,
        critical_freqs=[20.0, 450.0],
        sampling_frequency=2000.0,
        band_type="bandpass",
    ),
    dict(
        order=4,
        critical_freqs=30.0,
        sampling_frequency=200.0,
        band_type="highpass",
    ),
    dict(
        order=4,
        critical_freqs=10.0,
        sampling_frequency=100.0,
        filter_type="cheby1",
        cheby_param=1.0,
    ),
    dict(
        order=4,
        critical_freqs=10.0,
        sampling_frequency=100.0,
        filter_type="cheby2",
        cheby_param=40.0,
    ),
]


@pytest.mark.parametrize("design", DESIGNS)
def test_sos_design_matches_scipy(design):
    mine = sos_design(**design)
    kind = design.get("filter_type", "butter")
    btype = design.get("band_type", "lowpass")
    if kind == "butter":
        ref = sps.butter(
            design["order"],
            design["critical_freqs"],
            btype=btype,
            output="sos",
            fs=design["sampling_frequency"],
        )
    else:
        fn = sps.cheby1 if kind == "cheby1" else sps.cheby2
        ref = fn(
            design["order"],
            design["cheby_param"],
            design["critical_freqs"],
            btype=btype,
            output="sos",
            fs=design["sampling_frequency"],
        )
    np.testing.assert_allclose(mine, ref)


@pytest.mark.parametrize("design", DESIGNS)
def test_sosfilt_matches_scipy(design):
    sos = sos_design(**design)
    x = _sig()
    mine = np.asarray(sosfilt(sos, x))
    ref = sps.sosfilt(sos, x, axis=0)
    # The parallel scan reorders float ops relative to scipy's
    # sequential loop; compare with magnitude-scaled tolerance.
    _assert_close(mine, ref)


def test_sosfilt_1d_and_zi():
    sos = sos_design(4, 10.0, 100.0)
    x = _sig(256, 1)[:, 0]
    zi = sosfilt_zi(sos) * x[0]
    mine, zf = sosfilt(sos, x, zi=zi, return_zf=True)
    ref, zf_ref = sps.sosfilt(sos, x, zi=sos_zi_like(sos, x))
    np.testing.assert_allclose(np.asarray(mine), ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(zf), zf_ref, rtol=1e-9, atol=1e-12)


def sos_zi_like(sos, x):
    return sps.sosfilt_zi(sos) * x[0]


def test_sosfilt_zi_matches_scipy():
    for design in DESIGNS:
        sos = sos_design(**design)
        np.testing.assert_allclose(
            sosfilt_zi(sos), sps.sosfilt_zi(sos), rtol=1e-9, atol=1e-12
        )


def test_default_padlen_matches_scipy():
    # scipy's internal formula, checked indirectly: our filtfilt with
    # padlen=None must equal scipy's with its own default.
    for design in DESIGNS:
        sos = sos_design(**design)
        n_sections = sos.shape[0]
        ntaps = 2 * n_sections + 1
        ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
        assert default_padlen(sos) == 3 * ntaps


@pytest.mark.parametrize("design", DESIGNS)
def test_sosfiltfilt_matches_scipy(design):
    sos = sos_design(**design)
    x = _sig()
    mine = np.asarray(sosfiltfilt(sos, x))
    ref = sps.sosfiltfilt(sos, x, axis=0)
    _assert_close(mine, ref)


def test_sosfiltfilt_explicit_padlen():
    sos = sos_design(4, 10.0, 100.0)
    x = _sig(300, 2)
    mine = np.asarray(sosfiltfilt(sos, x, padlen=50))
    ref = sps.sosfiltfilt(sos, x, axis=0, padlen=50)
    np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("padtype", ["even", "constant", None])
def test_sosfiltfilt_padtype_variants_match_scipy(padtype):
    sos = sos_design(4, 10.0, 100.0)
    x = _sig(300, 2)
    mine = np.asarray(sosfiltfilt(sos, x, padtype=padtype))
    ref = sps.sosfiltfilt(sos, x, axis=0, padtype=padtype)
    np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-10)


def test_sosfiltfilt_padtype_none_allows_short_signal():
    # With padtype=None scipy forces padlen=0, so a signal shorter than
    # the default pad length is accepted.
    sos = sos_design(4, 10.0, 100.0)
    x = _sig(20, 2)
    mine = np.asarray(sosfiltfilt(sos, x, padtype=None))
    ref = sps.sosfiltfilt(sos, x, axis=0, padtype=None)
    np.testing.assert_allclose(mine, ref, rtol=1e-8, atol=1e-10)


def test_sosfiltfilt_rejects_bad_padtype():
    sos = sos_design(4, 10.0, 100.0)
    with pytest.raises(ValueError, match="padtype"):
        sosfiltfilt(sos, np.ones((300, 2)), padtype="reflect")


def test_sosfiltfilt_rejects_short_signal():
    sos = sos_design(4, 10.0, 100.0)
    with pytest.raises(ValueError, match="padlen"):
        sosfiltfilt(sos, np.ones((5, 2)))


def test_reference_envelope_filter_parity():
    # The tutorial's envelope settings: order-13 Butterworth low-pass at
    # 4 Hz on a 2000 Hz capture, zero-lag (reference notebook cell 14).
    sos = sos_design(13, 4.0, 2000.0)
    x = np.abs(_sig(1500, 8))
    mine = np.asarray(sosfiltfilt(sos, x))
    ref = sps.sosfiltfilt(sos, x, axis=0)
    np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=1e-9)
