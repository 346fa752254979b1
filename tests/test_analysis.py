"""Parity tests for the pandas-level analysis API.

Each transform is checked against the exact formula the reference
delegates to (pandas/numpy/scipy; reference analysis.py), on the same
DataFrame conventions (one signal per column, optional inplace).
"""

import numpy as np
import pandas as pd
import pytest
from scipy import interpolate as sp_interpolate
from scipy import signal as sps
from scipy.fftpack import fft as sp_fft
from scipy.fftpack import fftfreq as sp_fftfreq

import muscle_synergies_tpu as mst

RNG = np.random.default_rng(7)


@pytest.fixture()
def df():
    data = RNG.standard_normal((256, 4))
    return pd.DataFrame(data, columns=["VL", "RF", "BF", "ST"])


class TestZeroCenter:
    def test_matches_pandas(self, df):
        out = mst.zero_center(df)
        expected = df - df.mean()
        np.testing.assert_allclose(out.to_numpy(), expected.to_numpy(), atol=1e-12)
        # the original is untouched
        assert not np.allclose(df.to_numpy().mean(axis=0), 0)

    def test_inplace(self, df):
        out = mst.zero_center(df, inplace=True)
        assert out is df
        np.testing.assert_allclose(df.mean().to_numpy(), 0, atol=1e-12)


class TestRMS:
    def test_matches_reference_formula(self, df):
        window = 16
        out = mst.rms(df, window)
        for j, col in enumerate(df.columns):
            sq = df[col].to_numpy() ** 2
            expected = np.sqrt(np.convolve(sq, np.ones(window) / window, "same"))
            np.testing.assert_allclose(out[col].to_numpy(), expected, atol=1e-12)

    def test_window_in_seconds(self, df):
        # 0.08 s at 200 Hz -> 16 samples, same result as above.
        by_samples = mst.rms(df, 16)
        by_seconds = mst.rms(df, 0.08, sampling_frequency=200)
        np.testing.assert_allclose(
            by_samples.to_numpy(), by_seconds.to_numpy(), atol=1e-12
        )

    def test_bad_window(self, df):
        with pytest.raises(ValueError):
            mst.rms(df, 0)


class TestNormalize:
    def test_matches_pandas(self, df):
        out = mst.normalize(df)
        expected = df / df.abs().max()
        np.testing.assert_allclose(out.to_numpy(), expected.to_numpy(), atol=1e-12)
        assert np.allclose(out.abs().max().to_numpy(), 1.0)


class TestSubsample:
    def test_decimation(self, df):
        out = mst.subsample(df, 4)
        expected = df.iloc[::4]
        assert out.equals(expected)

    def test_none_returns_all(self, df):
        assert mst.subsample(df).shape == df.shape


class TestTimeNormalize:
    def test_matches_scipy_linear(self, df):
        out = mst.time_normalize(df, reduce_to=100)
        interp = sp_interpolate.interp1d(
            np.linspace(0, 1, len(df)), df.to_numpy(), axis=0, kind="linear"
        )
        expected = interp(np.linspace(0, 1, 100))
        np.testing.assert_allclose(out.to_numpy(), expected, atol=1e-10)
        np.testing.assert_allclose(out.index.to_numpy(), np.linspace(0, 1, 100))
        assert list(out.columns) == list(df.columns)

    def test_upsample(self, df):
        out = mst.time_normalize(df.iloc[:50], reduce_to=200)
        assert out.shape == (200, 4)

    def test_cubic_fallback(self, df):
        out = mst.time_normalize(df, reduce_to=64, kind="cubic")
        interp = sp_interpolate.interp1d(
            np.linspace(0, 1, len(df)), df.to_numpy(), axis=0, kind="cubic",
            fill_value="extrapolate",
        )
        np.testing.assert_allclose(
            out.to_numpy(), interp(np.linspace(0, 1, 64)), atol=1e-10
        )


class TestFFTSpectrum:
    def test_matches_scipy(self, df):
        fs = 200
        out = mst.fft_spectrum(df, fs)
        freqs = sp_fftfreq(len(df), 1.0 / fs)
        pos = freqs > 0
        expected = np.abs(sp_fft(df.to_numpy(), axis=0)[pos])
        np.testing.assert_allclose(out.to_numpy(), expected, atol=1e-8)
        np.testing.assert_allclose(out.index.to_numpy(), freqs[pos])


class TestDigitalFilter:
    def test_matches_scipy_filtfilt(self, df):
        out = mst.digital_filter(
            df, critical_freqs=10.0, sampling_frequency=100.0, order=4
        )
        sos = sps.butter(4, 10.0, output="sos", fs=100.0)
        expected = sps.sosfiltfilt(sos, df.to_numpy(), axis=0)
        np.testing.assert_allclose(out.to_numpy(), expected, rtol=1e-7, atol=1e-9)

    def test_causal(self, df):
        out = mst.digital_filter(
            df,
            critical_freqs=10.0,
            sampling_frequency=100.0,
            order=4,
            zero_lag=False,
        )
        sos = sps.butter(4, 10.0, output="sos", fs=100.0)
        expected = sps.sosfilt(sos, df.to_numpy(), axis=0)
        np.testing.assert_allclose(out.to_numpy(), expected, rtol=1e-7, atol=1e-9)

    def test_bad_filter_type(self, df):
        with pytest.raises(ValueError, match="filter type"):
            mst.digital_filter(
                df,
                critical_freqs=10.0,
                sampling_frequency=100.0,
                order=4,
                filter_type="bessel",
            )


class TestLinearEnvelope:
    def test_pipeline_matches_manual_composition(self, df):
        out = mst.linear_envelope(
            df, critical_freqs=10.0, sampling_frequency=100.0, order=4
        )
        centered = df - df.mean()
        sos = sps.butter(4, 10.0, output="sos", fs=100.0)
        expected = sps.sosfiltfilt(sos, centered.abs().to_numpy(), axis=0)
        np.testing.assert_allclose(out.to_numpy(), expected, rtol=1e-7, atol=1e-9)

    def test_no_zero_center(self, df):
        out = mst.linear_envelope(
            df,
            critical_freqs=10.0,
            sampling_frequency=100.0,
            order=4,
            zero_center_=False,
        )
        sos = sps.butter(4, 10.0, output="sos", fs=100.0)
        expected = sps.sosfiltfilt(sos, df.abs().to_numpy(), axis=0)
        np.testing.assert_allclose(out.to_numpy(), expected, rtol=1e-7, atol=1e-9)


class TestVAF:
    def test_perfect_reconstruction(self, df):
        out = mst.vaf(df, reconstructed_signal=df.to_numpy())
        assert out.shape == (1, 5)
        np.testing.assert_allclose(out.to_numpy(), 1.0)

    def test_factor_form(self, df):
        x = df.abs()
        w = RNG.random((256, 2))
        h = RNG.random((2, 4))
        out = mst.vaf(x, transformed_signal=w, components=h)
        err = x.to_numpy() - w @ h
        expected_overall = 1 - (err**2).sum() / (x.to_numpy() ** 2).sum()
        np.testing.assert_allclose(out["All signals"].iloc[0], expected_overall)
        assert list(out.columns) == ["All signals", "VL", "RF", "BF", "ST"]
        # Per-column parity vs the host-numpy float64 oracle: the
        # device-backed ops.emg.vaf path must agree bit-for-bit at x64.
        expected_per = 1 - (err**2).sum(axis=0) / (x.to_numpy() ** 2).sum(
            axis=0
        )
        np.testing.assert_allclose(
            out.to_numpy()[0, 1:], np.asarray(expected_per)
        )


class TestViz:
    def test_plot_signal_returns_figure(self, df):
        import matplotlib

        matplotlib.use("Agg")
        fig = mst.plot_signal(df, show=False)
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_plot_fft_and_heatmap(self, df):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = mst.plot_fft(df, 200, show=False)
        plt.close(fig)
        comps = pd.DataFrame(RNG.random((2, 4)), columns=df.columns)
        fig = mst.synergy_heatmap(comps, show=False)
        plt.close(fig)

    def test_plot_dims_mismatch(self, df):
        import matplotlib

        matplotlib.use("Agg")
        with pytest.raises(ValueError):
            mst.plot_signal(df, plot_dims=(3, 1), show=False)


class TestInplaceSemantics:
    """Every transform honors inplace=True/False like the reference."""

    @pytest.mark.parametrize(
        "call",
        [
            lambda df: mst.rms(df, 8, inplace=True),
            lambda df: mst.normalize(df, inplace=True),
            lambda df: mst.digital_filter(
                df, 10.0, 100.0, 4, inplace=True
            ),
            lambda df: mst.linear_envelope(
                df, 10.0, 100.0, 4, inplace=True
            ),
        ],
    )
    def test_inplace_returns_same_object(self, df, call):
        out = call(df)
        assert out is df

    @pytest.mark.parametrize(
        "call",
        [
            lambda df: mst.rms(df, 8),
            lambda df: mst.normalize(df),
            lambda df: mst.digital_filter(df, 10.0, 100.0, 4),
        ],
    )
    def test_pure_leaves_original(self, df, call):
        before = df.to_numpy().copy()
        out = call(df)
        assert out is not df
        np.testing.assert_array_equal(df.to_numpy(), before)


def test_moving_rms_f32_transient_precision():
    """Quiet-tail RMS survives a large early transient in float32.

    A plain f32 cumsum accumulates the transient's energy (~5e7) and
    the windowed difference of two nearby totals cancels to exactly 0;
    the compensated (double-float) scan keeps the tail accurate.
    """
    import jax.numpy as jnp

    from muscle_synergies_tpu.ops.emg import moving_rms

    rng = np.random.default_rng(0)
    n = 60_000
    x = 0.01 * rng.standard_normal(n)
    x[:4000] += 100.0 * rng.standard_normal(4000)
    got = np.asarray(moving_rms(jnp.asarray(x, jnp.float32), 1000))
    sq = np.convolve(x.astype(np.float64) ** 2, np.ones(1000) / 1000,
                     "same")
    ref = np.sqrt(np.maximum(sq, 0))
    tail = slice(10_000, None)
    rel = np.abs(got[tail] - ref[tail]) / ref[tail]
    assert float(rel.max()) < 1e-4
    assert not (got[tail] == 0).any()


def test_normalize_dead_channel_stays_zero():
    """All-zero channels normalize to zero, not NaN (both APIs)."""
    import jax.numpy as jnp

    from muscle_synergies_tpu.ops.batched import normalize_batch
    from muscle_synergies_tpu.ops.emg import normalize

    x = np.zeros((50, 3))
    x[:, 0] = np.sin(np.arange(50))
    out = np.asarray(normalize(jnp.asarray(x)))
    assert not np.isnan(out).any()
    assert (out[:, 1:] == 0).all()
    outb = np.asarray(normalize_batch(jnp.asarray(x)[None]))
    np.testing.assert_array_equal(out, outb[0])


def test_moving_rms_batch_rejects_short_trials():
    import jax.numpy as jnp

    from muscle_synergies_tpu.ops.batched import moving_rms_batch

    xs = np.zeros((2, 100, 3))
    mask = np.ones((2, 100))
    mask[1, 30:] = 0.0  # trial 2 is only 30 valid samples long
    with pytest.raises(ValueError, match="shortest"):
        moving_rms_batch(jnp.asarray(xs), 50, jnp.asarray(mask))
