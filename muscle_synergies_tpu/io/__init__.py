"""Ingest layer: Vicon Nexus CSV parsing and trial batching."""

from .batch import TrialBatch, batch_iterator, device_prefetch, stack_trials
from .vicon import ViconCSVError, load_vicon_file, load_vicon_files

__all__ = [
    "load_vicon_file",
    "load_vicon_files",
    "ViconCSVError",
    "TrialBatch",
    "stack_trials",
    "batch_iterator",
    "device_prefetch",
]
