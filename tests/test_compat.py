"""The reference package's public API works through the compat facade."""

import numpy as np
import pandas as pd
import pytest


def test_reference_toplevel_names():
    import muscle_synergies as ms

    for name in (
        "load_vicon_file", "plot_signal", "synergy_heatmap", "plot_fft",
        "fft_spectrum", "zero_center", "linear_envelope", "digital_filter",
        "rms", "normalize", "subsample", "time_normalize", "vaf",
        "find_synergies",
    ):
        assert hasattr(ms, name), name
    assert set(ms.__all__) == {
        "load_vicon_file", "plot_signal", "synergy_heatmap", "plot_fft",
        "fft_spectrum", "zero_center", "linear_envelope", "digital_filter",
        "rms", "normalize", "subsample", "time_normalize", "vaf",
        "find_synergies",
    }


def test_vicon_data_submodule():
    import muscle_synergies.vicon_data as vd

    assert vd.DeviceType.from_str("emg") is vd.DeviceType.EMG
    assert callable(vd.load_vicon_file)


def test_reference_style_workflow(tmp_path):
    # the reference tutorial's calls, verbatim style
    import muscle_synergies as ms
    from tests.test_ingest import GOLDEN_CSV

    path = tmp_path / "trial.csv"
    path.write_text(GOLDEN_CSV)
    data = ms.load_vicon_file(path)
    emg = data.emg.df
    rng = np.random.default_rng(0)
    # the golden capture is tiny; use synthetic longer data for the
    # numeric steps
    emg = pd.DataFrame(
        np.abs(rng.standard_normal((600, 4))), columns=emg.columns
    )
    proc = ms.rms(emg, window_size=0.05, sampling_frequency=300)
    proc = ms.time_normalize(proc, reduce_to=100)
    proc = ms.normalize(proc)
    res = ms.find_synergies(proc, 2, max_iter=2000, tol=1e-6)
    assert res.vaf_values.shape == (1, 5)
    assert res.components.shape == (2, 4)


def test_definitions_module_drop_in():
    """Reference-era imports from vicon_data.definitions resolve.

    Reference definitions.py:18-199 exports this exact vocabulary.
    """
    from muscle_synergies.vicon_data.definitions import (
        DeviceType,
        ForcePlateMeasurement,
        Row,
        SamplingFreq,
        SectionType,
        ViconCSVLines,
    )

    assert DeviceType.from_str("fp") is DeviceType.FORCE_PLATE
    assert DeviceType.EMG.section_type() is SectionType.FORCES_EMG
    assert (
        DeviceType.TRAJECTORY_MARKER.section_type()
        is SectionType.TRAJECTORIES
    )
    assert {m.name for m in ForcePlateMeasurement} == {
        "FORCE", "MOMENT", "COP",
    }
    assert {m.name for m in ViconCSVLines} == {
        "SECTION_TYPE_LINE", "SAMPLING_FREQUENCY_LINE",
        "DEVICE_NAMES_LINE", "COORDINATES_LINE", "UNITS_LINE",
        "DATA_LINE", "BLANK_LINE",
    }
    assert SamplingFreq(300, 100, 2).num_subframes == 3
    assert Row is not None


def test_enum_vocabulary_matches_reference_package():
    """Member names and values equal the reference's, member for member."""
    import importlib.util
    import os

    ref_path = (
        "/root/reference/src/muscle_synergies/vicon_data/definitions.py"
    )
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("_ref_definitions", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from muscle_synergies.vicon_data import definitions as ours

    for enum_name in (
        "SectionType", "ViconCSVLines", "DeviceType", "ForcePlateMeasurement",
    ):
        ref_enum = getattr(ref, enum_name)
        our_enum = getattr(ours, enum_name)
        assert {(m.name, m.value) for m in ref_enum} == {
            (m.name, m.value) for m in our_enum
        }, enum_name


def test_create_loading_run_drop_in(tmp_path):
    """The reference's DI-factory workflow produces identical data.

    Mirrors reference load_csv.py:96-135: stream rows into the Reader,
    then Builder.build().
    """
    from muscle_synergies.vicon_data import load_csv as lc
    from tests.test_ingest import GOLDEN_CSV

    path = tmp_path / "trial.csv"
    path.write_text(GOLDEN_CSV)

    run = lc.create_loading_run()
    for row in lc.csv_row_stream(path):
        run.reader.feed_row(row)
    built = run.builder.build()

    import muscle_synergies_tpu as mst

    direct = mst.load_vicon_file(path)
    assert built.emg.name == direct.emg.name
    np.testing.assert_array_equal(built.emg.array, direct.emg.array)
    assert [d.name for d in built.forcepl] == [d.name for d in direct.forcepl]
    np.testing.assert_array_equal(
        built.forcepl[0].array, direct.forcepl[0].array
    )
    assert [d.name for d in built.traj] == [d.name for d in direct.traj]

    # load_csv.load_vicon_file is the same composition
    via_module = lc.load_vicon_file(path)
    np.testing.assert_array_equal(via_module.emg.array, direct.emg.array)


def test_create_reader_rejects_custom_state():
    from muscle_synergies.vicon_data import load_csv as lc

    with pytest.raises(ValueError, match="state"):
        lc.create_reader(initial_state=object())

    # shared-aggregator plumbing works standalone too
    agg = lc.Aggregator()
    reader = lc.create_reader(aggregator=agg)
    builder = lc.create_builder(aggregator=agg)
    assert reader.aggregator is builder.aggregator


def test_quoted_cells_roundtrip_through_push_adapters(tmp_path):
    """Reader.feed_row cells with commas survive Builder.build verbatim.

    The reference contract is that fed cells are atomic (Reader gets
    csv.reader rows); the push adapters must not lose that on the
    re-serialization into the bulk parser.
    """
    from muscle_synergies.vicon_data.load_csv import (
        create_loading_run,
        csv_row_stream,
    )
    from tests.test_ingest import GOLDEN_CSV

    quoted = GOLDEN_CSV.replace(
        "Plate A - Force", '"Plate A, Left - Force"'
    ).replace(
        "Plate A - Moment", '"Plate A, Left - Moment"'
    ).replace(
        "Plate A - CoP", '"Plate A, Left - CoP"'
    )
    path = tmp_path / "quoted.csv"
    path.write_text(quoted)

    run = create_loading_run()
    for row in csv_row_stream(path):
        run.reader.feed_row(row)
    data = run.builder.build()

    import muscle_synergies_tpu as mst

    direct = mst.load_vicon_file(path)
    assert data.forcepl[0].name == "Plate A, Left"
    assert data.forcepl[0].name == direct.forcepl[0].name
    pd.testing.assert_frame_equal(data.emg.df, direct.emg.df)
    pd.testing.assert_frame_equal(data.forcepl[0].df, direct.forcepl[0].df)


def test_module_path_twins_importable():
    """Reference module paths reader/aggregator/user_data resolve."""
    from muscle_synergies.vicon_data import aggregator, reader, user_data

    assert reader.Reader is not None
    assert aggregator.Aggregator is not None
    assert user_data.DeviceData is not None
    from muscle_synergies.vicon_data.user_data import (
        DeviceData,
        ViconNexusData,
    )
    import muscle_synergies_tpu as mst

    assert ViconNexusData is mst.ViconNexusData
    assert DeviceData is mst.DeviceData


def test_analysis_module_path_twin():
    """``muscle_synergies.analysis`` resolves like the reference's.

    Reference src/muscle_synergies/analysis.py:1 is an importable module
    (tutorials do ``from muscle_synergies.analysis import find_synergies``).
    """
    import importlib

    import muscle_synergies_tpu as mst

    mod = importlib.import_module("muscle_synergies.analysis")
    from muscle_synergies.analysis import (  # noqa: F401
        SynergyRunResult,
        find_synergies,
        vaf,
        zero_center,
    )

    assert find_synergies is mst.find_synergies
    assert SynergyRunResult is mst.SynergyRunResult
    # Every public name of the reference module resolves on the twin.
    for name in (
        "plot_signal",
        "synergy_heatmap",
        "plot_fft",
        "fft_spectrum",
        "zero_center",
        "linear_envelope",
        "digital_filter",
        "rms",
        "normalize",
        "subsample",
        "time_normalize",
        "vaf",
        "find_synergies",
        "SynergyRunResult",
    ):
        assert hasattr(mod, name), name


class TestFeedTimeErrors:
    """Reader.feed_row raises AT the offending row, like the reference.

    The reference's state machine raises inside feed_row (reference
    reader.py:56-63) and load_vicon_file wraps with the 1-based line
    number (reference load_csv.py:128-134); the push adapter must not
    defer those errors to build().
    """

    @staticmethod
    def _feed_until_error(lines):
        import csv as _csv

        from muscle_synergies.vicon_data import load_csv as lc
        from muscle_synergies_tpu.io.vicon import ViconCSVError

        run = lc.create_loading_run()
        for i, row in enumerate(_csv.reader(lines), start=1):
            try:
                run.reader.feed_row(row)
            except ViconCSVError as exc:
                return i, str(exc)
        return None, None

    def test_bad_section_word_raises_at_line_1(self):
        from tests.test_ingest import GOLDEN_CSV

        lines = GOLDEN_CSV.splitlines()
        lines[0] = lines[0].replace("Devices", "Gadgets")
        at, msg = self._feed_until_error(lines)
        assert at == 1
        assert "line 1" in msg and "Devices" in msg

    def test_bad_sampling_freq_raises_at_line_2(self):
        from tests.test_ingest import GOLDEN_CSV

        lines = GOLDEN_CSV.splitlines()
        lines[1] = lines[1].replace("300", "three hundred")
        at, msg = self._feed_until_error(lines)
        assert at == 2
        assert "line 2" in msg and "sampling frequency" in msg

    def test_bad_data_cell_raises_at_its_line(self):
        from tests.test_ingest import GOLDEN_CSV

        lines = GOLDEN_CSV.splitlines()
        # line 7 (1-based) is the second data row of the Devices section
        lines[6] = lines[6].replace("1.5", "oops")
        at, msg = self._feed_until_error(lines)
        assert at == 7
        assert "line 7" in msg and "oops" in msg

    def test_trajectories_section_word_enforced(self):
        from tests.test_ingest import GOLDEN_CSV

        lines = GOLDEN_CSV.splitlines()
        traj_line = lines.index(
            next(l for l in lines if l.startswith("Trajectories"))
        )
        lines[traj_line] = lines[traj_line].replace(
            "Trajectories", "Devices"
        )
        at, msg = self._feed_until_error(lines)
        assert at == traj_line + 1
        assert f"line {traj_line + 1}" in msg and "Trajectories" in msg

    def test_malformed_devices_header_raises_at_line_3(self):
        from tests.test_ingest import GOLDEN_CSV

        lines = GOLDEN_CSV.splitlines()
        lines[2] = "NotBlank," + lines[2][1:]
        at, msg = self._feed_until_error(lines)
        assert at == 3
        assert "line 3" in msg

    def test_valid_file_feeds_clean_and_extra_blanks_ok(self, tmp_path):
        import csv as _csv

        from muscle_synergies.vicon_data import load_csv as lc
        from tests.test_ingest import GOLDEN_CSV

        lines = GOLDEN_CSV.splitlines()
        # duplicate the separator blank: legal for the bulk splitter,
        # must be legal at feed time too
        sep = lines.index(",,,,,,,,,,,,,,,,,,,,,,,,,")
        lines.insert(sep, ",,,,,,,,,,,,,,,,,,,,,,,,,")
        run = lc.create_loading_run()
        for row in _csv.reader(lines):
            run.reader.feed_row(row)  # must not raise
        data = run.builder.build()
        assert data.emg is not None

    def test_feed_time_matches_bulk_line_number(self, tmp_path):
        """Push feed-time and bulk build() agree on the reported line."""
        import pytest

        from muscle_synergies_tpu.io.vicon import (
            ViconCSVError,
            load_vicon_lines,
        )
        from tests.test_ingest import GOLDEN_CSV

        lines = GOLDEN_CSV.splitlines()
        lines[0] = lines[0].replace("Devices", "Gadgets")
        with pytest.raises(ViconCSVError, match="line 1"):
            load_vicon_lines(lines)
        at, msg = self._feed_until_error(lines)
        assert at == 1 and "line 1" in msg
