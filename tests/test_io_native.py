"""Tests for the native CSV decoder and the trial batching pipeline."""

import numpy as np
import pytest

from muscle_synergies_tpu.io import (
    TrialBatch,
    batch_iterator,
    device_prefetch,
    stack_trials,
)
from muscle_synergies_tpu.native import decode_block, load_decoder

RNG = np.random.default_rng(33)

native_available = load_decoder() is not None


@pytest.mark.skipif(not native_available, reason="no C++ toolchain")
class TestNativeDecoder:
    def test_matches_pandas_with_gaps_and_padding(self):
        import io as _io

        import pandas as pd

        data = RNG.standard_normal((500, 12)).round(5)
        rows = []
        for ri, r in enumerate(data):
            cells = [
                "" if (ri + i) % 13 == 0 else f"{v:.5g}"
                for i, v in enumerate(r)
            ]
            rows.append(",".join(cells) + ",,")
        text = "\n".join(rows)
        mine = decode_block(text.encode(), 12)
        ref = (
            pd.read_csv(_io.StringIO(text), header=None, dtype=float)
            .to_numpy()[:, :12]
        )
        assert np.array_equal(mine, ref, equal_nan=True)

    def test_scientific_notation_and_signs(self):
        text = b"1.5E-03,-2.5e+4,+3\n-0.5,,7e0\n"
        out = decode_block(text, 3)
        expected = np.array([[1.5e-3, -2.5e4, 3.0], [-0.5, np.nan, 7.0]])
        assert np.array_equal(out, expected, equal_nan=True)

    def test_short_rows_pad_with_nan(self):
        out = decode_block(b"1,2\n3\n", 3)
        expected = np.array([[1, 2, np.nan], [3, np.nan, np.nan]])
        assert np.array_equal(out, expected, equal_nan=True)

    def test_bad_cell_reports_row(self):
        with pytest.raises(ValueError, match="row 2"):
            decode_block(b"1,2,3\n4,oops,6\n", 3)

    def test_blank_lines_skipped(self):
        out = decode_block(b"1,2\n,,\n3,4\n", 2)
        assert np.array_equal(out, np.array([[1.0, 2.0], [3.0, 4.0]]))

    def test_threaded_path_matches_single_thread(self, monkeypatch):
        """MSK_DECODE_THREADS forces the row-partitioned path.

        The sandbox exposes one CPU, so without the override the
        threaded decode (chunk splitting, per-chunk row offsets, error
        propagation) would never execute here.  The block must exceed
        the 1 MB threshold for the override to take effect.
        """
        data = RNG.standard_normal((9000, 20)).round(8)
        rows = [",".join(f"{v:.8f}" for v in r) for r in data]
        rows[1234] = ",, , ,"  # blank line inside a chunk
        rows[7000] = "1,2,3"  # short row
        text = ("\n".join(rows) + "\n").encode()
        assert len(text) > (1 << 20)
        single = decode_block(text, 20)
        monkeypatch.setenv("MSK_DECODE_THREADS", "4")
        threaded = decode_block(text, 20)
        assert np.array_equal(single, threaded, equal_nan=True)
        assert single.shape == (8999, 20)  # blank line dropped
        with pytest.raises(ValueError, match="row 8000"):
            bad = rows[:]
            bad[8000] = "1,bogus,3"
            decode_block(("\n".join(bad) + "\n").encode(), 20)

    def test_ingest_paths_agree(self, tmp_path):
        # load the same file with and without the native decoder
        import os

        from muscle_synergies_tpu import load_vicon_file
        from tests.test_ingest import GOLDEN_CSV

        path = tmp_path / "golden.csv"
        path.write_text(GOLDEN_CSV)
        native = load_vicon_file(path)
        os.environ["MST_DISABLE_NATIVE"] = "1"
        try:
            fallback = load_vicon_file(path)
        finally:
            del os.environ["MST_DISABLE_NATIVE"]
        for a, b in zip(
            [native.emg] + native.forcepl + native.traj,
            [fallback.emg] + fallback.forcepl + fallback.traj,
        ):
            np.testing.assert_array_equal(a.array, b.array)


class TestTrialBatching:
    def test_stack_trials(self):
        trials = [RNG.random((50, 4)), RNG.random((30, 4))]
        batch = stack_trials(trials, names=["a", "b"])
        assert isinstance(batch, TrialBatch)
        assert batch.data.shape == (2, 50, 4)
        assert batch.batch_size == 2
        assert list(batch.lengths) == [50, 30]
        assert float(batch.mask[1, 29]) == 1.0
        assert float(batch.mask[1, 30]) == 0.0

    def test_batch_iterator_shapes(self):
        trials = [RNG.random((40 + i, 3)) for i in range(5)]
        batches = list(batch_iterator(trials, batch_size=2))
        assert [b.batch_size for b in batches] == [2, 2, 1]
        # every batch padded to the global max length
        assert all(b.data.shape[1] == 44 for b in batches)

    def test_batch_iterator_drop_remainder(self):
        trials = [RNG.random((10, 3)) for _ in range(5)]
        batches = list(
            batch_iterator(trials, batch_size=2, drop_remainder=True)
        )
        assert [b.batch_size for b in batches] == [2, 2]

    def test_device_prefetch_preserves_order_and_values(self):
        items = [np.full((4, 4), i, dtype=float) for i in range(6)]
        out = list(device_prefetch(iter(items), buffer_size=2))
        assert len(out) == 6
        for i, arr in enumerate(out):
            np.testing.assert_array_equal(np.asarray(arr), items[i])


class TestReviewRegressions:
    @pytest.mark.skipif(not native_available, reason="no C++ toolchain")
    def test_whitespace_blank_lines_agree_with_counter(self):
        out = decode_block(b"1,2\n , ,\n,,\n3,4\n", 2)
        assert np.array_equal(out, np.array([[1.0, 2.0], [3.0, 4.0]]))

    def test_prefetch_propagates_producer_error(self):
        def bad_iter():
            yield np.ones((2, 2))
            raise ValueError("boom in producer")

        with pytest.raises(ValueError, match="boom"):
            list(device_prefetch(bad_iter()))


def test_load_vicon_files_parallel(tmp_path):
    from muscle_synergies_tpu.io import load_vicon_files
    from tests.test_ingest import GOLDEN_CSV

    paths = []
    for i in range(3):
        p = tmp_path / f"t{i}.csv"
        p.write_text(GOLDEN_CSV)
        paths.append(p)
    captures = load_vicon_files(paths)
    assert len(captures) == 3
    for cap in captures:
        assert cap.emg.array.shape == (6, 4)


def test_batch_iterator_slices_names():
    from muscle_synergies_tpu.io.batch import batch_iterator

    trials = [np.zeros((4, 2)) for _ in range(5)]
    names = [f"t{i}" for i in range(5)]
    batches = list(batch_iterator(trials, 2, names=names))
    assert [b.names for b in batches] == [["t0", "t1"], ["t2", "t3"], ["t4"]]
    with pytest.raises(ValueError, match="names"):
        list(batch_iterator(trials, 2, names=names[:3]))


def test_device_prefetch_early_exit_releases_producer():
    import threading
    import time as _time

    from muscle_synergies_tpu.io.batch import device_prefetch

    released = threading.Event()

    def source():
        try:
            for i in range(100):
                yield np.zeros((2, 2)) + i
        finally:
            released.set()

    for _ in device_prefetch(source(), buffer_size=1):
        break  # abandon the generator immediately
    for _ in range(100):
        if released.is_set():
            break
        _time.sleep(0.05)
    assert released.is_set(), "producer thread still pinned the source"


def test_pandas_fallback_tolerates_wide_rows(tmp_path, monkeypatch):
    """Rows wider than the first line decode like the native path."""
    import muscle_synergies_tpu.io.vicon as vicon

    monkeypatch.setenv("MST_DISABLE_NATIVE", "1")
    arr = vicon._decode_data_block(b"1.0,2.0\n1.0,2.0,3.0,4.0", 3, 1)
    assert arr.shape == (2, 3)
    assert np.isnan(arr[0, 2]) and arr[1, 2] == 3.0


def test_short_units_line_padded(tmp_path):
    from tests.test_ingest import GOLDEN_CSV

    # drop the trailing EMG units (writers may trim trailing commas)
    lines = GOLDEN_CSV.splitlines()
    assert lines[4].startswith(",,N,N")
    lines[4] = ",".join(lines[4].split(",")[:20])  # cut the V,V,V,V tail
    path = tmp_path / "short_units.csv"
    path.write_text("\n".join(lines) + "\n")
    from muscle_synergies_tpu import load_vicon_file

    data = load_vicon_file(path)
    assert data.emg.units == ("",) * 4  # padded, aligned with coords
    assert len(data.forcepl[0].units) == 9
