"""Module-path twin of the reference's ``vicon_data.reader``.

The reference defines its push parser here — ``Reader`` plus nine
private per-line state classes (reference
src/muscle_synergies/vicon_data/reader.py:30-987).  This framework's
ingest is a header sniff + bulk decode with no per-line state machine
(``muscle_synergies_tpu.io.vicon``), so the public surface of this
module is the push-style :class:`Reader` adapter from
:mod:`muscle_synergies.vicon_data.load_csv`; reference-era imports of
``muscle_synergies.vicon_data.reader.Reader`` keep working.
"""

from .load_csv import Aggregator, Reader

__all__ = ("Reader", "Aggregator")
