"""Drop-in twin of the reference's ``vicon_data.load_csv`` module.

The reference wires a push parser out of three collaborators —
``create_reader`` / ``create_builder`` / ``create_loading_run``
(reference src/muscle_synergies/vicon_data/load_csv.py:44-93) — where a
``Reader`` is fed one CSV row at a time and a ``Builder`` turns the
accumulated state into a :class:`ViconNexusData`.

The TPU framework ingests through one bulk decode instead (see
``muscle_synergies_tpu.io.vicon``), so these factories return thin
push-style adapters over the same shared row store: ``Reader.feed_row``
appends rows, ``Builder.build`` hands them to the bulk parser.  The
observable contract — feed every row, call ``build()``, get the same
data ``load_vicon_file`` produces, with 1-based line numbers in
errors — is identical.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

from muscle_synergies_tpu.data import ViconNexusData
from muscle_synergies_tpu.io.vicon import Row, load_vicon_lines

__all__ = (
    "csv_row_stream",
    "create_reader",
    "create_builder",
    "create_loading_run",
    "load_vicon_file",
    "Aggregator",
    "Reader",
    "Builder",
)


@dataclass
class Aggregator:
    """Shared store the Reader writes into and the Builder reads from.

    The reference's Aggregator is an incremental per-device columnar
    tree (reference vicon_data/aggregator.py:29-450); here the rows are
    kept verbatim and the column bookkeeping happens in the bulk
    decoder at ``build()`` time.
    """

    rows: List[Row] = field(default_factory=list)


class Reader:
    """Push-style row consumer (reference reader.py:30-63 contract)."""

    def __init__(self, aggregator: Optional[Aggregator] = None):
        self._aggregator = aggregator if aggregator is not None else Aggregator()

    @property
    def aggregator(self) -> Aggregator:
        return self._aggregator

    def feed_row(self, row: Row) -> None:
        """Accept one CSV row (a list of cell strings)."""
        self._aggregator.rows.append(list(row))


class Builder:
    """Turns the accumulated rows into a :class:`ViconNexusData`."""

    def __init__(self, aggregator: Optional[Aggregator] = None):
        self._aggregator = aggregator if aggregator is not None else Aggregator()

    @property
    def aggregator(self) -> Aggregator:
        return self._aggregator

    def build(self) -> ViconNexusData:
        # Re-serialize with csv quoting so cells containing commas or
        # quotes survive the round trip into the bulk parser verbatim
        # (Reader.feed_row's contract is that cells are atomic).
        import io

        buf = io.StringIO()
        csv.writer(buf, lineterminator="\n").writerows(self._aggregator.rows)
        return load_vicon_lines(buf.getvalue().splitlines())


def create_reader(
    initial_state=None, aggregator: Optional[Aggregator] = None
) -> Reader:
    """Initialize a new Reader (reference load_csv.py:44-63 signature).

    ``initial_state`` existed to inject a custom parser state machine;
    the bulk decoder has no per-line states, so only the default
    (``None``) is accepted.
    """
    if initial_state is not None:
        raise ValueError(
            "custom reader states are a reference-internal extension "
            "point; the TPU ingest has no per-line state machine"
        )
    return Reader(aggregator=aggregator)


def create_builder(aggregator: Optional[Aggregator] = None) -> Builder:
    """Initialize a new Builder (reference load_csv.py:66-77 signature)."""
    return Builder(aggregator=aggregator)


@dataclass
class _LoadingRun:
    """The objects used to load the Vicon Nexus CSV file."""

    reader: Reader
    builder: Builder


def create_loading_run() -> _LoadingRun:
    """Create a Reader/Builder pair sharing one Aggregator."""
    aggregator = Aggregator()
    return _LoadingRun(
        reader=create_reader(aggregator=aggregator),
        builder=create_builder(aggregator=aggregator),
    )


def csv_row_stream(csv_filename) -> Iterator[Row]:
    """Yield the file's rows one at a time (reference load_csv.py:21-31)."""
    with open(csv_filename, newline="") as stream:
        yield from csv.reader(stream)


def load_vicon_file(csv_filename) -> ViconNexusData:
    """Reference-shaped entry point built on the push adapters.

    Behaviorally identical to
    :func:`muscle_synergies_tpu.load_vicon_file`; this variant exists
    so code that patched or wrapped the reference's ``load_csv``
    collaborators keeps a faithful seam.
    """
    run = create_loading_run()
    for row in csv_row_stream(csv_filename):
        run.reader.feed_row(row)
    return run.builder.build()
