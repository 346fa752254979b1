"""Native (C++) runtime components, bound through ctypes.

Currently: the Vicon CSV numeric-block decoder
(:mod:`vicon_decode.cpp`).  The shared library builds on first use with
``g++ -O3`` and is cached next to the source; when no compiler is
available the ingest layer falls back to the pandas C reader
transparently.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "vicon_decode.cpp"
_LIB = _HERE / "libvicon_decode.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", str(_LIB), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_decoder() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the decoder library, or None."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        stale = (
            not _LIB.exists()
            or _LIB.stat().st_mtime < _SRC.stat().st_mtime
        )
        if stale and not _build():
            # never load a library older than its source — fall back
            # to the (correct) pandas path instead
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.msk_count_rows.restype = ctypes.c_long
            lib.msk_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_long]
            lib.msk_decode_block.restype = ctypes.c_long
            lib.msk_decode_block.argtypes = [
                ctypes.c_char_p,
                ctypes.c_long,
                ctypes.c_long,
                np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def decode_block(text: bytes, num_cols: int) -> Optional[np.ndarray]:
    """Decode a numeric CSV block natively; None if unavailable.

    Raises:
        ValueError: naming the offending row when a cell fails to parse.
    """
    lib = load_decoder()
    if lib is None:
        return None
    if isinstance(text, str):
        text = text.encode()
    # capacity bound: newline count (memchr-fast) upper-bounds the data
    # rows (blank lines only shrink it), saving the decoder's exact
    # content-aware counting pass over the whole buffer
    n_rows = text.count(b"\n") + 1
    out = np.empty((n_rows, num_cols), dtype=np.float64)
    got = ctypes.c_long(0)
    status = lib.msk_decode_block(
        text, len(text), num_cols, out, n_rows, ctypes.byref(got)
    )
    if status != 0:
        raise ValueError(
            f"could not decode data block: bad numeric cell in row {status}"
        )
    return out[: got.value]


__all__ = ["decode_block", "load_decoder"]
