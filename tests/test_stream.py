"""Streaming ingest parity: chunked reads equal whole-file parsing.

The chunk iterator must reproduce ``load_vicon_file``'s arrays exactly
for any chunk size, keep grammar errors identical, and enable exact
streaming reductions (causal filtering with carried state).
"""

import gzip

import numpy as np
import pytest

from muscle_synergies_tpu import ViconCSVError, load_vicon_file
from muscle_synergies_tpu.io import DeviceStream, stream_vicon_file
from muscle_synergies_tpu.ops import sos_design, sosfilt, sosfilt_zi

from test_ingest import GOLDEN_CSV


@pytest.fixture(scope="module")
def golden_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("stream") / "golden.csv"
    path.write_text(GOLDEN_CSV)
    return path


def _big_csv(path, rows=3000):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((rows, 4)).round(6)
    lines = [
        "Devices,,,,,",
        "300,,,,,",
        ",,BigEMG - Voltage,,,",
        "Frame,Sub Frame,E1,E2,E3,E4",
        ",,V,V,V,V",
    ]
    for i, row in enumerate(data):
        lines.append(f"{i // 3 + 1},{i % 3}," + ",".join(map(str, row)))
    lines += [
        ",,,,,",
        "Trajectories,,,,,",
        "100,,,,,",
        ",,M:1,,,",
        "Frame,Sub Frame,X,Y,Z,",
        ",,mm,mm,mm,",
    ]
    for i in range(rows // 3):
        lines.append(f"{i + 1},0,1.0,2.0,3.0,")
    path.write_text("\n".join(lines) + "\n")
    return data


class TestStreamChunks:
    @pytest.mark.parametrize("chunk_rows", [1, 4, 1000])
    def test_concatenated_chunks_match_whole_file(self, golden_path, chunk_rows):
        full = load_vicon_file(golden_path)
        by_section = {}
        for chunk in stream_vicon_file(golden_path, chunk_rows=chunk_rows):
            by_section.setdefault(chunk.header.section_type, []).append(chunk)

        assert set(by_section) == {"Devices", "Trajectories"}
        fast = np.concatenate([c.data for c in by_section["Devices"]])
        emg_cols = slice(
            by_section["Devices"][0].header.devices[-1].first_col, None
        )
        np.testing.assert_array_equal(fast[:, emg_cols], full.emg.array)

        slow = np.concatenate([c.data for c in by_section["Trajectories"]])
        np.testing.assert_array_equal(slow[:, 2:5], full.traj[0].array)

    def test_row_offsets_and_sizes(self, golden_path):
        chunks = [
            c
            for c in stream_vicon_file(golden_path, chunk_rows=4)
            if c.header.section_type == "Devices"
        ]
        assert [c.row_offset for c in chunks] == [0, 4]
        assert [c.data.shape[0] for c in chunks] == [4, 2]

    def test_headers_carry_metadata(self, golden_path):
        first = next(stream_vicon_file(golden_path))
        assert first.header.frequency == 300
        assert [d.name for d in first.header.devices] == [
            "Plate A",
            "Plate B",
            "MyEMG - Voltage",
        ]
        assert first.header.num_cols == 24

    def test_gzip_transparent(self, tmp_path):
        path = tmp_path / "cap.csv.gz"
        with gzip.open(path, "wt") as f:
            f.write(GOLDEN_CSV)
        fast = np.concatenate(
            [
                c.data
                for c in stream_vicon_file(path, chunk_rows=2)
                if c.header.section_type == "Devices"
            ]
        )
        assert fast.shape == (6, 24)

    def test_rejects_bad_chunk_rows(self, golden_path):
        with pytest.raises(ValueError, match="chunk_rows"):
            next(stream_vicon_file(golden_path, chunk_rows=0))

    def test_stop_after_devices_skips_trajectories(self, golden_path):
        chunks = list(
            stream_vicon_file(golden_path, chunk_rows=2, stop_after="Devices")
        )
        assert chunks and all(
            c.header.section_type == "Devices" for c in chunks
        )
        with pytest.raises(ValueError, match="stop_after"):
            next(stream_vicon_file(golden_path, stop_after="devices"))

    def test_extra_section_raises(self, tmp_path):
        path = tmp_path / "extra.csv"
        path.write_text(GOLDEN_CSV + "\nDevices,,\n300,,\n")
        with pytest.raises(ViconCSVError, match="found more"):
            list(stream_vicon_file(path))

    def test_missing_section_raises(self, tmp_path):
        path = tmp_path / "onesec.csv"
        path.write_text(GOLDEN_CSV.split("Trajectories")[0])
        with pytest.raises(ViconCSVError, match="found 1"):
            list(stream_vicon_file(path))

    def test_short_header_raises(self, tmp_path):
        path = tmp_path / "short.csv"
        path.write_text("Devices,,\n300,,\n,,D - Force,,\n")
        with pytest.raises(ViconCSVError, match="too short"):
            list(stream_vicon_file(path))


class TestDeviceStream:
    def test_emg_metadata_and_chunks(self, golden_path):
        full = load_vicon_file(golden_path)
        stream = DeviceStream(golden_path, "emg", chunk_rows=2)
        assert stream.frequency == 300
        assert stream.coords == ["E1", "E2", "E3", "E4"]
        assert stream.units == ["V", "V", "V", "V"]
        got = np.concatenate(list(stream))
        np.testing.assert_array_equal(got, full.emg.array)

    def test_force_plate_by_index(self, golden_path):
        full = load_vicon_file(golden_path)
        got = np.concatenate(list(DeviceStream(golden_path, 1, chunk_rows=3)))
        np.testing.assert_array_equal(got, full.forcepl[1].array)

    def test_device_by_name(self, golden_path):
        full = load_vicon_file(golden_path)
        got = np.concatenate(list(DeviceStream(golden_path, "Plate A")))
        np.testing.assert_array_equal(got, full.forcepl[0].array)

    def test_unknown_device_raises(self, golden_path):
        with pytest.raises(KeyError, match="available"):
            DeviceStream(golden_path, "nope")
        with pytest.raises(KeyError, match="out of range"):
            DeviceStream(golden_path, 7)

    def test_stream_is_reiterable(self, golden_path):
        stream = DeviceStream(golden_path, "emg", chunk_rows=2)
        a = np.concatenate(list(stream))
        b = np.concatenate(list(stream))
        np.testing.assert_array_equal(a, b)


def test_streaming_causal_filter_is_exact(tmp_path):
    """Carrying sosfilt state across chunks equals one-shot filtering."""
    path = tmp_path / "big.csv"
    data = _big_csv(path, rows=3000)
    sos = sos_design(4, 10.0, 300.0)

    full = np.asarray(sosfilt(sos, data))

    stream = DeviceStream(path, "emg", chunk_rows=700)
    zi = None
    pieces = []
    for chunk in stream:
        if zi is None:
            zi = np.asarray(sosfilt_zi(sos))[:, :, None] * np.zeros(
                (chunk.shape[1],)
            )
        y, zi = sosfilt(sos, chunk, zi=zi, return_zf=True)
        pieces.append(np.asarray(y))
    streamed = np.concatenate(pieces)

    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=1e-10, atol=1e-12)
