"""Parity test against the reference repository's sample capture.

Loads the reference's ``sample_data/abridged_data.csv`` (when the
reference checkout is present) and checks the parsed result against the
same expectations the reference's own functional suite asserts
(reference tests/func/conftest.py:97-311): device names, units, every
EMG data cell, sampling rates and frame/subframe behavior.  Skipped when
the reference data is unavailable.
"""

import os

import numpy as np
import pytest

from muscle_synergies_tpu import DeviceType, load_vicon_file

ABRIDGED = "/root/reference/sample_data/abridged_data.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ABRIDGED), reason="reference sample data not available"
)


@pytest.fixture(scope="module")
def abridged():
    return load_vicon_file(ABRIDGED)


def test_device_names(abridged):
    assert abridged.forcepl[0].name == "Imported AMTI OR6 Series Force Plate #1"
    assert abridged.forcepl[1].name == "Imported AMTI OR6 Series Force Plate #2"
    assert abridged.emg.name == "EMG2000 - Voltage"
    assert [d.name for d in abridged.traj] == [
        "Angelica:HV",
        "Angelica:CM_E",
        "Angelica:CL_E",
        "Angelica:ELAST_DP",
    ]


def test_device_types(abridged):
    assert all(d.dev_type is DeviceType.FORCE_PLATE for d in abridged.forcepl)
    assert abridged.emg.dev_type is DeviceType.EMG
    assert all(d.dev_type is DeviceType.TRAJECTORY_MARKER for d in abridged.traj)


def test_columns_and_units(abridged):
    assert tuple(abridged.emg.df.columns) == (
        "VL", "RF", "GMED", "TFL", "GMAXS", "GMAXI", "BF", "ST",
    )
    assert abridged.emg.units == ("V",) * 8
    for dev in abridged.forcepl:
        assert tuple(dev.df.columns) == (
            "Fx", "Fy", "Fz", "Mx", "My", "Mz", "Cx", "Cy", "Cz",
        )
        assert dev.units == ("N", "N", "N", "N.mm", "N.mm", "N.mm", "mm", "mm", "mm")
    for dev in abridged.traj:
        assert tuple(dev.df.columns) == ("X", "Y", "Z")
        assert dev.units == ("mm", "mm", "mm")


def test_emg_cells(abridged):
    expected = np.array(
        [
            [0.0037236, 0.00722359, 0.00344124, 0.00149971,
             -0.000798493, -0.00196037, -0.00602333, -0.00232391],
            [0.00463913, 0.00478218, 0.00206795, 0.000889358,
             -3.56e-05, -0.00150261, -0.00373451, -0.0036972],
            [0.00448654, 0.00142525, 0.000389481, -2.62e-05,
             -0.000798493, -0.00241814, 0.00191124, -0.00537567],
            [0.00235031, -0.00147392, -0.00098381, -0.0021624,
             -0.000493317, -0.000587082, 0.00786217, -0.00644379],
            [0.00204514, -0.00223686, -0.000220871, -0.0021624,
             -0.00156143, 0.00200691, 0.0128976, -0.00522308],
            [0.000519257, 5.20e-05, 0.00115242, -0.000789109,
             -0.00140884, 0.00246468, 0.014576, -0.0012558],
        ]
    )
    np.testing.assert_array_equal(abridged.emg.array, expected)


def test_force_plate_cells(abridged):
    exp1 = np.array([[0, 0, 0, 0, 0, 0, 232, 254, 0]] * 6, dtype=float)
    exp2 = np.array([[0, 0, 0, 0, 0, 0, 232, 769, 0]] * 6, dtype=float)
    np.testing.assert_array_equal(abridged.forcepl[0].array, exp1)
    np.testing.assert_array_equal(abridged.forcepl[1].array, exp2)


def test_trajectory_cells(abridged):
    np.testing.assert_array_equal(
        abridged.traj[0].array,
        np.array([[209.331, 1219.74, 1780.67], [209.475, 1219.82, 1780.88]]),
    )
    np.testing.assert_array_equal(
        abridged.traj[2].array,
        np.array([[227.725, 1091.81, 496.721], [227.702, 1091.8, 496.729]]),
    )
    assert np.isnan(abridged.traj[1].array).all()
    assert np.isnan(abridged.traj[3].array).all()


def test_sampling(abridged):
    assert abridged.emg.sampling_frequency == 300
    assert abridged.traj[0].sampling_frequency == 100
    assert abridged.sampling_freq.num_subframes == 3
    assert abridged.sampling_freq.num_frames == 2


def test_specific_frame_subframe(abridged):
    row = list(abridged.traj[0][2, 2])
    assert row == [209.475, 1219.82, 1780.88]


def test_invalid_frame_subframe(abridged):
    for pair in [(-1, 0), (0, 3), (1, 3), (3, 0), (3, 2)]:
        with pytest.raises(IndexError):
            abridged.emg[pair]
