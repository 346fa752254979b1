"""Randomized parser fuzzing: native and fallback paths must agree.

Generates random grammar-conforming Vicon exports (random device
counts, channel counts, rates, missing cells, trailing padding,
scientific notation) and checks that the native C++ decode path and
the pandas fallback produce identical captures.
"""

import os

import numpy as np
import pytest

from muscle_synergies_tpu import load_vicon_file
from muscle_synergies_tpu.native import load_decoder

def _random_capture_text(rng):
    n_plates = int(rng.integers(0, 4))
    n_emg = int(rng.integers(1, 10))
    n_markers = int(rng.integers(1, 6))
    subframes = int(rng.integers(1, 5))
    n_frames = int(rng.integers(2, 10))
    slow = int(rng.integers(50, 200))
    fast = slow * subframes

    def fmt(v):
        style = rng.integers(0, 3)
        if style == 0:
            return f"{v:.6g}"
        if style == 1:
            return f"{v:.3E}"
        return f"{v:.4f}"

    lines = []
    trailing = "," * int(rng.integers(0, 6))
    # Devices section
    lines.append("Devices" + trailing)
    lines.append(f"{fast}" + trailing)
    headers = [""] * 2
    for p in range(n_plates):
        for kind in ("Force", "Moment", "CoP"):
            headers += [f"Plate {p} - {kind}", "", ""]
    headers += [f"EMG unit {n_emg} - Voltage"]
    lines.append(",".join(headers) + trailing)
    coords = ["Frame", "Sub Frame"] + (
        ["Fx", "Fy", "Fz", "Mx", "My", "Mz", "Cx", "Cy", "Cz"] * n_plates
    ) + [f"M{i}" for i in range(n_emg)]
    lines.append(",".join(coords) + trailing)
    units = ["", ""] + (["N"] * 3 + ["N.mm"] * 3 + ["mm"] * 3) * n_plates + (
        ["V"] * n_emg
    )
    lines.append(",".join(units) + trailing)
    n_cols = len(coords)
    for i in range(n_frames * subframes):
        vals = rng.standard_normal(n_cols - 2)
        cells = [str(i // subframes + 1), str(i % subframes)]
        for v in vals:
            cells.append("" if rng.random() < 0.08 else fmt(v))
        lines.append(",".join(cells) + trailing)
    lines.append("," * max(3, n_cols))
    # Trajectories section
    lines.append("Trajectories" + trailing)
    lines.append(f"{slow}" + trailing)
    headers = [""] * 2
    for m in range(n_markers):
        headers += [f"S:{m}", "", ""]
    lines.append(",".join(headers) + trailing)
    lines.append(
        ",".join(["Frame", "Sub Frame"] + ["X", "Y", "Z"] * n_markers)
        + trailing
    )
    lines.append(",".join(["", ""] + ["mm"] * (3 * n_markers)) + trailing)
    for i in range(n_frames):
        vals = rng.standard_normal(3 * n_markers)
        cells = [str(i + 1), "0"]
        for v in vals:
            cells.append("" if rng.random() < 0.15 else fmt(v))
        lines.append(",".join(cells) + trailing)
    return "\n".join(lines) + "\n", n_plates, n_emg, n_markers


@pytest.mark.skipif(load_decoder() is None, reason="no C++ toolchain")
@pytest.mark.parametrize("seed", range(12))
def test_native_and_fallback_paths_agree(tmp_path, seed):
    rng = np.random.default_rng(seed)
    text, n_plates, n_emg, n_markers = _random_capture_text(rng)
    path = tmp_path / f"fuzz_{seed}.csv"
    path.write_text(text)

    native = load_vicon_file(path)
    prior = os.environ.get("MST_DISABLE_NATIVE")
    os.environ["MST_DISABLE_NATIVE"] = "1"
    try:
        fallback = load_vicon_file(path)
    finally:
        if prior is None:
            del os.environ["MST_DISABLE_NATIVE"]
        else:
            os.environ["MST_DISABLE_NATIVE"] = prior

    assert len(native.forcepl) == n_plates
    assert len(native.traj) == n_markers
    assert native.emg.array.shape[1] == n_emg
    for a, b in zip(
        [native.emg] + native.forcepl + native.traj,
        [fallback.emg] + fallback.forcepl + fallback.traj,
    ):
        assert a.name == b.name
        assert a.units == b.units
        np.testing.assert_array_equal(a.array, b.array)


@pytest.mark.skipif(load_decoder() is None, reason="no C++ toolchain")
@pytest.mark.parametrize("seed", range(12, 24))
def test_structural_variants_agree(tmp_path, seed):
    """Byte-level structure fuzz: the splitter must tolerate CRLF,
    extra/leading/trailing blank separator lines, a missing final
    newline, and quoted device names — with native and fallback decode
    paths still byte-identical."""
    rng = np.random.default_rng(seed)
    text, n_plates, n_emg, n_markers = _random_capture_text(rng)

    # quoted device name containing a comma (keeps the plate count)
    if n_plates and rng.random() < 0.7:
        for kind in ("Force", "Moment", "CoP"):
            text = text.replace(
                f"Plate 0 - {kind}", f'"Plate 0, L - {kind}"'
            )

    lines = text.split("\n")
    # extra blank separator lines (various shapes) around the boundary
    idx = lines.index("Trajectories" + lines[0][len("Devices"):])
    for blank in ["", ",,,", " , ,", "\t,"][: int(rng.integers(0, 4))]:
        lines.insert(idx, blank)
    # leading blanks before the Devices section
    for _ in range(int(rng.integers(0, 3))):
        lines.insert(0, "," * int(rng.integers(0, 5)))
    # trailing blanks after the trajectories block
    for _ in range(int(rng.integers(0, 3))):
        lines.append("," * int(rng.integers(0, 5)))
    text = "\n".join(lines)
    if rng.random() < 0.5:
        text = text.rstrip("\n")  # no final newline
    if rng.random() < 0.5:
        text = text.replace("\n", "\r\n")  # CRLF terminators

    path = tmp_path / f"fuzz_struct_{seed}.csv"
    path.write_bytes(text.encode())

    native = load_vicon_file(path)
    prior = os.environ.get("MST_DISABLE_NATIVE")
    os.environ["MST_DISABLE_NATIVE"] = "1"
    try:
        fallback = load_vicon_file(path)
    finally:
        if prior is None:
            del os.environ["MST_DISABLE_NATIVE"]
        else:
            os.environ["MST_DISABLE_NATIVE"] = prior

    assert len(native.forcepl) == n_plates
    assert len(native.traj) == n_markers
    assert native.emg.array.shape[1] == n_emg
    for a, b in zip(
        [native.emg] + native.forcepl + native.traj,
        [fallback.emg] + fallback.forcepl + fallback.traj,
    ):
        assert a.name == b.name
        assert a.units == b.units
        np.testing.assert_array_equal(a.array, b.array)
