"""Golden-file tests for the Vicon Nexus CSV parser.

Mirrors the reference's functional test strategy (reference
tests/func/conftest.py + test_data_loading.py): parse a small capture
and compare every device's name, type, units, columns and data cells
against hand-coded expectations; check frame/subframe round-trips and
out-of-range errors.  The golden capture here is synthetic (2 force
plates + 4-channel EMG @ 300 Hz, 2 markers @ 100 Hz) and exercises
trailing blank columns, missing marker cells and scientific notation.
"""

import numpy as np
import pandas as pd
import pytest

from muscle_synergies_tpu import (
    DeviceType,
    ViconCSVError,
    load_vicon_file,
)

GOLDEN_CSV = """\
Devices,,,,,,,,,,,,,,,,,,,,,,,,,
300,,,,,,,,,,,,,,,,,,,,,,,,,
,,Plate A - Force,,,Plate A - Moment,,,Plate A - CoP,,,Plate B - Force,,,Plate B - Moment,,,Plate B - CoP,,,MyEMG - Voltage,,,,,
Frame,Sub Frame,Fx,Fy,Fz,Mx,My,Mz,Cx,Cy,Cz,Fx,Fy,Fz,Mx,My,Mz,Cx,Cy,Cz,E1,E2,E3,E4,,
,,N,N,N,N.mm,N.mm,N.mm,mm,mm,mm,N,N,N,N.mm,N.mm,N.mm,mm,mm,mm,V,V,V,V,,
1,0,1,2,3,4,5,6,7,8,9,10,20,30,40,50,60,70,80,90,0.1,0.2,0.3,0.4,,
1,1,1.5,2,3,4,5,6,7,8,9,10,20,30,40,50,60,70,80,90,0.11,0.21,0.31,0.41,,
1,2,2,2,3,4,5,6,7,8,9,10,20,30,40,50,60,70,80,90,-0.1,1.2E-03,0.3,0.4,,
2,0,1,2,3,4,5,6,7,8,9,11,21,31,41,51,61,71,81,91,0.5,0.6,0.7,0.8,,
2,1,1,2,3,4,5,6,7,8,9,11,21,31,41,51,61,71,81,91,0.51,0.61,0.71,0.81,,
2,2,1,2,3,4,5,6,7,8,9,11,21,31,41,51,61,71,81,91,0.52,0.62,0.72,0.82,,
,,,,,,,,,,,,,,,,,,,,,,,,,
Trajectories,,,,,,,,,,,,,,,,,,,,,,,,,
100,,,,,,,,,,,,,,,,,,,,,,,,,
,,Subj:M1,,,Subj:M2,,
Frame,Sub Frame,X,Y,Z,X,Y,Z
,,mm,mm,mm,mm,mm,mm
1,0,100.5,200.25,300.125,,,
2,0,101.5,201.25,301.125,,,
"""

EXP_EMG = np.array(
    [
        [0.1, 0.2, 0.3, 0.4],
        [0.11, 0.21, 0.31, 0.41],
        [-0.1, 1.2e-03, 0.3, 0.4],
        [0.5, 0.6, 0.7, 0.8],
        [0.51, 0.61, 0.71, 0.81],
        [0.52, 0.62, 0.72, 0.82],
    ]
)
EXP_PLATE_A = np.array([[1, 2, 3, 4, 5, 6, 7, 8, 9]] * 6, dtype=float)
EXP_PLATE_A[1, 0] = 1.5
EXP_PLATE_A[2, 0] = 2.0
EXP_PLATE_B = np.array(
    [[10, 20, 30, 40, 50, 60, 70, 80, 90]] * 3
    + [[11, 21, 31, 41, 51, 61, 71, 81, 91]] * 3,
    dtype=float,
)
EXP_M1 = np.array([[100.5, 200.25, 300.125], [101.5, 201.25, 301.125]])
EXP_M2 = np.full((2, 3), np.nan)

FORCEP_COLS = ("Fx", "Fy", "Fz", "Mx", "My", "Mz", "Cx", "Cy", "Cz")
FORCEP_UNITS = ("N", "N", "N", "N.mm", "N.mm", "N.mm", "mm", "mm", "mm")


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    path = tmp_path_factory.mktemp("vicon") / "golden.csv"
    path.write_text(GOLDEN_CSV)
    return load_vicon_file(path)


class TestGoldenCapture:
    def test_device_counts(self, golden):
        assert len(golden.forcepl) == 2
        assert len(golden.traj) == 2
        assert golden.emg is not None

    def test_names(self, golden):
        assert golden.forcepl[0].name == "Plate A"
        assert golden.forcepl[1].name == "Plate B"
        assert golden.emg.name == "MyEMG - Voltage"
        assert golden.traj[0].name == "Subj:M1"
        assert golden.traj[1].name == "Subj:M2"

    def test_types(self, golden):
        assert golden.forcepl[0].dev_type is DeviceType.FORCE_PLATE
        assert golden.emg.dev_type is DeviceType.EMG
        assert golden.traj[0].dev_type is DeviceType.TRAJECTORY_MARKER

    def test_units(self, golden):
        assert golden.forcepl[0].units == FORCEP_UNITS
        assert golden.forcepl[1].units == FORCEP_UNITS
        assert golden.emg.units == ("V",) * 4
        assert golden.traj[0].units == ("mm",) * 3

    def test_columns(self, golden):
        assert tuple(golden.forcepl[0].df.columns) == FORCEP_COLS
        assert tuple(golden.emg.df.columns) == ("E1", "E2", "E3", "E4")
        assert tuple(golden.traj[0].df.columns) == ("X", "Y", "Z")

    def test_data_values(self, golden):
        np.testing.assert_array_equal(golden.emg.array, EXP_EMG)
        np.testing.assert_array_equal(golden.forcepl[0].array, EXP_PLATE_A)
        np.testing.assert_array_equal(golden.forcepl[1].array, EXP_PLATE_B)
        np.testing.assert_array_equal(golden.traj[0].array, EXP_M1)
        np.testing.assert_array_equal(golden.traj[1].array, EXP_M2)

    def test_dataframe_view_matches_expected(self, golden):
        exp = pd.DataFrame(EXP_EMG, columns=["E1", "E2", "E3", "E4"])
        assert golden.emg.df.equals(exp)

    def test_sampling_frequencies(self, golden):
        assert golden.emg.sampling_frequency == 300
        assert golden.forcepl[0].sampling_frequency == 300
        assert golden.traj[0].sampling_frequency == 100
        assert golden.sampling_frequency("emg") == 300
        assert golden.sampling_frequency("traj") == 100

    def test_sampling_freq_struct(self, golden):
        sf = golden.sampling_freq
        assert sf.freq_forces_emg == 300
        assert sf.freq_traj == 100
        assert sf.num_frames == 2
        assert sf.num_subframes == 3


class TestFrameSubframeIndexing:
    PAIRS = [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)]
    FAST_INDEX = [0, 1, 2, 3, 4, 5]
    SLOW_INDEX = [0, 0, 0, 1, 1, 1]

    def test_fast_section_index(self, golden):
        for pair, idx in zip(self.PAIRS, self.FAST_INDEX):
            row = golden.emg[pair]
            assert row.equals(golden.emg.df.iloc[idx])

    def test_slow_section_index(self, golden):
        for pair, idx in zip(self.PAIRS, self.SLOW_INDEX):
            row = golden.traj[0][pair]
            assert row.equals(golden.traj[0].df.iloc[idx])

    def test_round_trip(self, golden):
        for idx in range(6):
            pair = golden.emg.to_framesubfr(idx)
            assert golden.emg.to_index(pair) == idx
        for idx in range(2):
            pair = golden.traj[0].to_framesubfr(idx)
            assert golden.traj[0].to_index(pair) == idx

    @pytest.mark.parametrize(
        "pair", [(-1, 0), (0, 3), (1, 3), (3, 0), (3, 2)]
    )
    def test_invalid_pairs_raise(self, golden, pair):
        for dev in [golden.emg, golden.forcepl[0], golden.traj[0]]:
            with pytest.raises(IndexError):
                dev[pair]

    def test_slice_indexing(self, golden):
        sliced = golden.emg[(1, 1):(2, 1)]
        assert sliced.equals(golden.emg.df.iloc[1:4])

    def test_time_seq(self, golden):
        fast = golden.time_seq("emg")
        np.testing.assert_allclose(fast.to_numpy(), np.arange(1, 7) / 300.0)
        slow = golden.time_seq("traj")
        np.testing.assert_allclose(slow.to_numpy(), np.arange(1, 3) / 100.0)


class TestViconNexusDataAPI:
    def test_getitem_by_string_and_enum(self, golden):
        assert golden["emg"] is golden.emg
        assert golden[DeviceType.EMG] is golden.emg
        assert golden["fp"] == golden.forcepl
        assert golden["force plate"] == golden.forcepl
        assert golden["traj"] == golden.traj
        assert golden["marker"] == golden.traj

    def test_bad_device_type(self, golden):
        with pytest.raises((KeyError, ValueError)):
            golden["accelerometer"]

    def test_get_cols_emg(self, golden):
        col = golden.get_cols("emg", cols="E1")
        np.testing.assert_array_equal(col.to_numpy(), EXP_EMG[:, 0])

    def test_get_cols_forcepl(self, golden):
        cols = golden.get_cols("fp", cols="Fz")
        assert len(cols) == 2
        np.testing.assert_array_equal(cols[0].to_numpy(), EXP_PLATE_A[:, 2])

    def test_get_cols_device_inds(self, golden):
        cols = golden.get_cols("fp", device_inds=[1], cols="Fx")
        assert len(cols) == 1
        np.testing.assert_array_equal(cols[0].to_numpy(), EXP_PLATE_B[:, 0])

    def test_get_cols_with_time(self, golden):
        col = golden.get_cols("emg", time=(1, 1), cols="E2")
        assert col == EXP_EMG[1, 1]

    def test_describe(self, golden):
        text = golden.describe()
        assert "4 columns" in text
        assert "2 devices" in text

    def test_array_bundles(self, golden):
        assert golden.forcepl_array().shape == (2, 6, 9)
        assert golden.emg_array().shape == (6, 4)
        assert golden.traj_array().shape == (2, 2, 3)


class TestMalformedInput:
    def _load(self, tmp_path, text):
        path = tmp_path / "bad.csv"
        path.write_text(text)
        return load_vicon_file(path)

    def test_wrong_section_word(self, tmp_path):
        with pytest.raises(ViconCSVError, match="line 1"):
            self._load(tmp_path, GOLDEN_CSV.replace("Devices", "Gadgets", 1))

    def test_bad_frequency(self, tmp_path):
        with pytest.raises(ViconCSVError, match="line 2"):
            self._load(tmp_path, GOLDEN_CSV.replace("300,", "3a0,", 1))

    def test_bad_device_header_layout(self, tmp_path):
        bad = GOLDEN_CSV.replace(
            ",,Plate A - Force,,", "Oops,,Plate A - Force,,", 1
        )
        with pytest.raises(ViconCSVError, match="line 3"):
            self._load(tmp_path, bad)

    def test_non_numeric_data_cell(self, tmp_path):
        bad = GOLDEN_CSV.replace("1,0,1,2,3", "1,0,xx,2,3", 1)
        with pytest.raises(ViconCSVError):
            self._load(tmp_path, bad)

    def test_missing_section(self, tmp_path):
        head = GOLDEN_CSV.split("Trajectories")[0].rstrip(", \n")
        with pytest.raises(ViconCSVError, match="2 sections"):
            self._load(tmp_path, head)


def test_crlf_line_endings(tmp_path):
    path = tmp_path / "crlf.csv"
    path.write_bytes(GOLDEN_CSV.replace("\n", "\r\n").encode())
    data = load_vicon_file(path)
    np.testing.assert_array_equal(data.emg.array, EXP_EMG)
    assert data.emg.units == ("V",) * 4


def test_gzip_transparent(tmp_path):
    import gzip

    path = tmp_path / "trial.csv.gz"
    with gzip.open(path, "wt") as f:
        f.write(GOLDEN_CSV)
    data = load_vicon_file(path)
    np.testing.assert_array_equal(data.emg.array, EXP_EMG)


def test_quoted_cells_stay_atomic(tmp_path):
    """A quoted device name containing commas parses as one cell.

    The reference row stream is ``csv.reader`` (reference
    load_csv.py:21-31), which keeps quoted cells atomic; the bulk
    decoder must match.
    """
    quoted = GOLDEN_CSV.replace(
        "Plate A - Force", '"Plate A, Left - Force"'
    ).replace(
        "Plate A - Moment", '"Plate A, Left - Moment"'
    ).replace(
        "Plate A - CoP", '"Plate A, Left - CoP"'
    )
    path = tmp_path / "quoted.csv"
    path.write_text(quoted)
    data = load_vicon_file(path)
    assert data.forcepl[0].name == "Plate A, Left"
    assert data.forcepl[1].name == "Plate B"
    np.testing.assert_array_equal(data.emg.array, EXP_EMG)


def test_lone_cr_line_endings(tmp_path):
    """Classic-Mac CR-only terminators parse like LF (splitlines parity)."""
    path = tmp_path / "cr.csv"
    path.write_bytes(GOLDEN_CSV.replace("\n", "\r").encode())
    data = load_vicon_file(path)
    np.testing.assert_array_equal(data.emg.array, EXP_EMG)
    assert data.forcepl[0].name == "Plate A"
