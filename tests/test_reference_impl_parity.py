"""Run the actual reference implementation side-by-side with ours.

Loads the same synthetic capture through both stacks (the reference
package is imported read-only from ``/root/reference/src``) and asserts
cell-exact parser parity plus preprocessing parity at float64.  This is
the strongest drop-in guarantee available without the reference's
missing ``dynamic_trial.csv``.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def capture_path(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from benchmarks.end_to_end import synthesize_csv

    path = tmp_path_factory.mktemp("parity") / "trial.csv"
    synthesize_csv(path, n_frames_slow=60)
    return path


@pytest.fixture(scope="module")
def loaded(capture_path):
    import muscle_synergies_tpu as ours

    sys.path.insert(0, REFERENCE_SRC)
    # the in-repo compat facade shadows the reference; import the
    # reference's modules directly by path priority
    import importlib

    for mod in [m for m in list(sys.modules) if m.startswith("muscle_synergies")
                and not m.startswith("muscle_synergies_tpu")]:
        del sys.modules[mod]
    ref = importlib.import_module("muscle_synergies")
    if not ref.__file__.startswith(REFERENCE_SRC):  # pragma: no cover
        pytest.skip("could not import the reference implementation")
    ours_data = ours.load_vicon_file(capture_path)
    ref_data = ref.load_vicon_file(capture_path)
    yield ours, ours_data, ref, ref_data
    # restore the facade for later tests
    for mod in [m for m in list(sys.modules) if m.startswith("muscle_synergies")
                and not m.startswith("muscle_synergies_tpu")]:
        del sys.modules[mod]
    sys.path.remove(REFERENCE_SRC)


def test_parser_outputs_identical(loaded):
    _, ours_data, _, ref_data = loaded
    pairs = [(ours_data.emg, ref_data.emg)]
    pairs += list(zip(ours_data.forcepl, ref_data.forcepl))
    pairs += list(zip(ours_data.traj, ref_data.traj))
    assert len(ours_data.forcepl) == len(ref_data.forcepl)
    assert len(ours_data.traj) == len(ref_data.traj)
    for mine, theirs in pairs:
        assert mine.name == theirs.name
        assert tuple(mine.units) == tuple(theirs.units)
        assert tuple(mine.df.columns) == tuple(theirs.df.columns)
        np.testing.assert_array_equal(
            mine.df.to_numpy(), theirs.df.to_numpy()
        )


def test_frame_indexing_identical(loaded):
    _, ours_data, _, ref_data = loaded
    for pair in [(1, 0), (2, 5), (10, 19)]:
        np.testing.assert_array_equal(
            ours_data.emg[pair].to_numpy(), ref_data.emg[pair].to_numpy()
        )
    assert ours_data.to_index("emg", (3, 2)) == ref_data.to_index("emg", (3, 2))
    assert ours_data.to_framesubfr("traj", 5) == ref_data.to_framesubfr(
        "traj", 5
    )


def test_preprocessing_identical(loaded):
    ours, ours_data, ref, ref_data = loaded
    fs = ours_data.emg.sampling_frequency
    mine = ours.rms(ours_data.emg.df, window_size=0.05, sampling_frequency=fs)
    theirs = ref.rms(ref_data.emg.df, window_size=0.05, sampling_frequency=fs)
    np.testing.assert_allclose(
        mine.to_numpy(), theirs.to_numpy(), rtol=1e-10, atol=1e-14
    )

    mine = ours.time_normalize(ours.normalize(mine), reduce_to=100)
    theirs = ref.time_normalize(ref.normalize(theirs), reduce_to=100)
    np.testing.assert_allclose(
        mine.to_numpy(), theirs.to_numpy(), rtol=1e-9, atol=1e-12
    )

    mine_f = ours.digital_filter(
        ours_data.emg.df, 4.0, fs, order=4
    )
    theirs_f = ref.digital_filter(ref_data.emg.df, 4.0, fs, order=4)
    scale = np.abs(theirs_f.to_numpy()).max()
    np.testing.assert_allclose(
        mine_f.to_numpy(), theirs_f.to_numpy(), rtol=1e-7, atol=1e-8 * scale
    )


def test_vaf_identical(loaded):
    ours, ours_data, ref, ref_data = loaded
    rng = np.random.default_rng(0)
    x = ours_data.emg.df.abs()
    w = rng.random((len(x), 2))
    h = rng.random((2, x.shape[1]))
    mine = ours.vaf(x, transformed_signal=w, components=h)
    theirs = ref.vaf(ref_data.emg.df.abs(), transformed_signal=w, components=h)
    np.testing.assert_allclose(
        mine.to_numpy(), theirs.to_numpy(), rtol=1e-12
    )
