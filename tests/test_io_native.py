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
