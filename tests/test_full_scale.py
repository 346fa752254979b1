"""Full-production-scale ingest regression (synthetic TestFullData twin).

The reference's statistical suite (reference
tests/func/test_data_loading.py:64-149, conftest.py:470-512) runs
against ``dynamic_trial.csv`` — 124,460 samples x (2 force plates + 8
EMG channels) @ 2000 Hz plus 6,223 frames x 40 trajectory markers
@ 100 Hz — asserting device counts, names, column labels, units,
frequencies, shapes and spot statistics.  That file is absent from the
mirror (.MISSING_LARGE_BLOBS), so this twin synthesizes the exact
geometry, writes it through the Vicon CSV grammar, and asserts the same
battery against statistics computed from the source arrays before they
were written — ingest is regression-tested at production scale, not
just the 19-line abridged scale.

Values are rounded to 5 decimals before writing so the default
shortest-round-trip float formatting reproduces them bit-exactly on
load.
"""

import numpy as np
import pandas as pd
import pytest

import muscle_synergies_tpu as mst

N_FORCES = 124_460
N_TRAJ = 6_223
FREQ_FORCES = 2000
FREQ_TRAJ = 100
SUBFRAMES = FREQ_FORCES // FREQ_TRAJ

FP_COLS = ["Fx", "Fy", "Fz", "Mx", "My", "Mz", "Cx", "Cy", "Cz"]
FP_UNITS = ["N", "N", "N", "N.mm", "N.mm", "N.mm", "mm", "mm", "mm"]
EMG_NAMES = ["VL", "RF", "GMED", "TFL", "GMAXS", "GMAXI", "BF", "ST"]
N_MARKERS = 40
MISSING_MARKER = 7  # one marker entirely unlabeled, like real captures


def _marker_name(i: int) -> str:
    return f"Subject:M{i:02d}"


@pytest.fixture(scope="module")
def full_capture(tmp_path_factory):
    """Synthesize the full-trial CSV; return (path, source arrays)."""
    rng = np.random.default_rng(20260817)
    fp1 = np.round(rng.standard_normal((N_FORCES, 9)) * 100, 5)
    fp2 = np.round(rng.standard_normal((N_FORCES, 9)) * 100, 5)
    emg = np.round(rng.standard_normal((N_FORCES, 8)) * 0.005, 5)
    traj = np.round(rng.standard_normal((N_TRAJ, N_MARKERS * 3)) * 500, 5)
    traj[:, MISSING_MARKER * 3 : MISSING_MARKER * 3 + 3] = np.nan

    frames_f = np.repeat(np.arange(1, N_TRAJ + 1), SUBFRAMES)
    subframes_f = np.tile(np.arange(SUBFRAMES), N_TRAJ)

    path = tmp_path_factory.mktemp("full_scale") / "synthetic_trial.csv"
    with open(path, "w", newline="") as fh:
        fh.write("Devices\n")
        fh.write(f"{FREQ_FORCES}\n")
        headers = [""] * 2
        for plate in (1, 2):
            for meas in ("Force", "Moment", "CoP"):
                headers.append(
                    f"Imported AMTI OR6 Series Force Plate #{plate} - {meas}"
                )
                headers.extend(["", ""])
        headers.append("EMG2000 - Voltage")
        headers.extend([""] * 7)
        fh.write(",".join(headers) + "\n")
        fh.write(
            "Frame,Sub Frame," + ",".join(FP_COLS * 2 + EMG_NAMES) + "\n"
        )
        fh.write(",," + ",".join(FP_UNITS * 2 + ["V"] * 8) + "\n")
        body = pd.DataFrame(
            np.column_stack([fp1, fp2, emg])
        )
        body.insert(0, "sub", subframes_f)
        body.insert(0, "fr", frames_f)
        body.to_csv(fh, header=False, index=False)
        fh.write("\n")

        fh.write("Trajectories\n")
        fh.write(f"{FREQ_TRAJ}\n")
        headers = [""] * 2
        for i in range(N_MARKERS):
            headers.append(_marker_name(i))
            headers.extend(["", ""])
        fh.write(",".join(headers) + "\n")
        fh.write("Frame,Sub Frame," + ",".join(["X", "Y", "Z"] * N_MARKERS) + "\n")
        fh.write(",," + ",".join(["mm"] * (N_MARKERS * 3)) + "\n")
        body = pd.DataFrame(traj)
        body.insert(0, "sub", np.zeros(N_TRAJ, dtype=int))
        body.insert(0, "fr", np.arange(1, N_TRAJ + 1))
        body.to_csv(fh, header=False, index=False)
    data = mst.load_vicon_file(str(path))
    return data, fp1, fp2, emg, traj


@pytest.mark.slow
class TestFullScaleGeometry:
    def test_device_counts_and_names(self, full_capture):
        data, *_ = full_capture
        assert len(data.forcepl) == 2
        assert len(data.traj) == N_MARKERS
        assert data.forcepl[0].name == "Imported AMTI OR6 Series Force Plate #1"
        assert data.forcepl[1].name == "Imported AMTI OR6 Series Force Plate #2"
        assert data.emg.name == "EMG2000 - Voltage"
        assert [d.name for d in data.traj] == [
            _marker_name(i) for i in range(N_MARKERS)
        ]

    def test_frequencies_and_shapes(self, full_capture):
        data, *_ = full_capture
        assert data.sampling_frequency("emg") == FREQ_FORCES
        assert data.sampling_frequency("forcepl") == FREQ_FORCES
        assert data.sampling_frequency("traj") == FREQ_TRAJ
        for fp in data.forcepl:
            assert fp.df.shape == (N_FORCES, 9)
        assert data.emg.df.shape == (N_FORCES, 8)
        for marker in data.traj:
            assert marker.df.shape == (N_TRAJ, 3)

    def test_columns_and_units(self, full_capture):
        data, *_ = full_capture
        assert list(data.forcepl[0].df.columns) == FP_COLS
        assert list(data.forcepl[0].units) == FP_UNITS
        assert list(data.emg.df.columns) == EMG_NAMES
        assert list(data.emg.units) == ["V"] * 8
        assert list(data.traj[0].df.columns) == ["X", "Y", "Z"]
        assert list(data.traj[0].units) == ["mm"] * 3

    def test_values_round_trip_exactly(self, full_capture):
        """5-decimal values survive write -> bulk decode bit-exactly."""
        data, fp1, fp2, emg, traj = full_capture
        np.testing.assert_array_equal(np.asarray(data.forcepl[0].df), fp1)
        np.testing.assert_array_equal(np.asarray(data.forcepl[1].df), fp2)
        np.testing.assert_array_equal(np.asarray(data.emg.df), emg)

    def test_spot_statistics(self, full_capture):
        """The reference's statistical checks, against source truth."""
        data, fp1, fp2, emg, traj = full_capture
        # mean of the last 5000 force-plate samples (reference
        # test_data_loading.py:141-149 pattern)
        got = np.asarray(data.forcepl[1].df["Fz"])[-5000:].mean()
        np.testing.assert_allclose(got, fp2[-5000:, 2].mean(), rtol=1e-12)
        # per-column means of a trajectory marker
        got = np.asarray(data.traj[3].df).mean(axis=0)
        np.testing.assert_allclose(
            got, traj[:, 9:12].mean(axis=0), rtol=1e-12
        )
        # EMG channel means
        np.testing.assert_allclose(
            np.asarray(data.emg.df).mean(axis=0), emg.mean(axis=0),
            rtol=1e-12,
        )

    def test_missing_marker_is_all_nan(self, full_capture):
        data, *_ = full_capture
        assert np.isnan(np.asarray(data.traj[MISSING_MARKER].df)).all()

    def test_frame_subframe_indexing_at_scale(self, full_capture):
        data, *_ = full_capture
        # last frame/subframe maps to the last row of each section
        assert data.emg.to_index((N_TRAJ, SUBFRAMES - 1)) == N_FORCES - 1
        assert data.traj[0].to_index((N_TRAJ, 0)) == N_TRAJ - 1
        with pytest.raises(IndexError):
            data.emg[(N_TRAJ + 1, 0)]
