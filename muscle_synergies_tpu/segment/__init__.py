"""Gait segmentation from force-plate ground reactions."""

from .joint import phase_summary
from .gait import (
    Cycle,
    Phase,
    Segmenter,
    SegmentPlotter,
    Segments,
    Trecho,
    reactions,
    transition_indices,
)

__all__ = [
    "Phase",
    "Trecho",
    "Cycle",
    "Segments",
    "reactions",
    "transition_indices",
    "Segmenter",
    "SegmentPlotter",
    "phase_summary",
]
