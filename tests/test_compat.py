"""The reference package's public API works through the compat facade."""

import numpy as np
import pandas as pd


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
