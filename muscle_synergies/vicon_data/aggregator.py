"""Module-path twin of the reference's ``vicon_data.aggregator``.

The reference's ``Aggregator`` tree accumulates parsed cells
incrementally per device (reference
src/muscle_synergies/vicon_data/aggregator.py:29-450).  The bulk
decoder subsumes that bookkeeping in one dense pass, so the twin
exposes the row-store :class:`Aggregator` the push-style
``Reader``/``Builder`` adapters share; reference-era imports of
``muscle_synergies.vicon_data.aggregator.Aggregator`` keep working.
"""

from .load_csv import Aggregator

__all__ = ("Aggregator",)
