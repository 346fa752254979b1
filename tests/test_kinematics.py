"""Tests for kinematics ops and the per-phase joint analysis."""

import numpy as np
import pytest

from muscle_synergies_tpu.ops import (
    cop_path_length,
    finite_difference,
    grf_impulse,
    loading_rate,
    marker_acceleration,
    marker_speed,
    marker_velocity,
    upsample_to_fast,
)

RNG = np.random.default_rng(41)


class TestDerivatives:
    def test_linear_motion_exact(self):
        fs = 100.0
        t = np.arange(200) / fs
        traj = np.stack([3.0 * t, -2.0 * t, 0 * t], axis=1)
        vel = np.asarray(marker_velocity(traj, fs))
        np.testing.assert_allclose(vel, np.tile([3.0, -2.0, 0.0], (200, 1)),
                                   atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(marker_speed(traj, fs)),
            np.full(200, np.hypot(3.0, 2.0)),
            atol=1e-9,
        )

    def test_quadratic_acceleration(self):
        fs = 100.0
        t = np.arange(300) / fs
        traj = np.stack([0.5 * 4.0 * t**2, 0 * t, 0 * t], axis=1)
        acc = np.asarray(marker_acceleration(traj, fs))
        # interior: exact for polynomials of degree 2
        np.testing.assert_allclose(acc[2:-2, 0], 4.0, atol=1e-6)

    def test_shape_preserved(self):
        x = RNG.standard_normal((50, 3))
        assert finite_difference(x, 100.0).shape == (50, 3)


class TestUpsample:
    def test_matches_frame_alignment(self):
        slow = np.arange(10.0)[:, None]  # marker position = frame index
        fast = np.asarray(upsample_to_fast(slow, num_subframes=3))
        assert fast.shape == (30, 1)
        # slow sample f lands exactly at fast index 3f
        np.testing.assert_allclose(fast[::3, 0], slow[:, 0])
        # linear in between
        np.testing.assert_allclose(fast[1, 0], 1 / 3, atol=1e-12)

    def test_explicit_length(self):
        slow = RNG.standard_normal((10, 2))
        fast = upsample_to_fast(slow, 3, num_fast=28)
        assert fast.shape == (28, 2)


class TestForcePlateMetrics:
    def test_impulse_constant_force(self):
        fz = np.full(101, -50.0)
        imp = float(grf_impulse(fz, sampling_frequency=100.0))
        np.testing.assert_allclose(imp, -50.0 * 1.0, rtol=1e-9)

    def test_impulse_masked(self):
        fz = np.full(101, -50.0)
        mask = np.zeros(101)
        mask[:51] = 1.0
        imp = float(grf_impulse(fz, 100.0, mask=mask))
        np.testing.assert_allclose(imp, -50.0 * 0.5, rtol=1e-2)

    def test_cop_path_length(self):
        cop = np.stack([np.arange(11.0), np.zeros(11)], axis=1)
        assert float(cop_path_length(cop)) == pytest.approx(10.0)

    def test_cop_path_masked(self):
        cop = np.stack([np.arange(11.0), np.zeros(11)], axis=1)
        mask = np.ones(11)
        mask[5:] = 0.0
        assert float(cop_path_length(cop, mask)) == pytest.approx(4.0)

    def test_loading_rate_ramp(self):
        fs = 1000.0
        fz = np.concatenate([np.zeros(100), np.linspace(0, -800, 100),
                             np.full(100, -800.0)])
        rate = float(loading_rate(fz, fs))
        np.testing.assert_allclose(rate, 800 / 0.1, rtol=0.15)


class TestPhaseSummary:
    def test_summary_table(self):
        from muscle_synergies_tpu.segment import phase_summary
        from tests.test_segment import _capture

        data = _capture()
        table = phase_summary(data)
        # 4 trechos x 2 cycles x 4 phases
        assert len(table) == 32
        assert {"trecho", "cycle", "phase", "duration_s",
                "plate0_impulse_z"} <= set(table.columns)
        # single-support swing phases: right plate unloaded
        bl = table[table["phase"] == "BL"]
        np.testing.assert_allclose(bl["plate1_impulse_z"], 0.0, atol=1e-9)
        assert (bl["plate0_impulse_z"] < 0).all()
