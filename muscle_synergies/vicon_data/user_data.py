"""Module-path twin of the reference's ``vicon_data.user_data``.

Re-exports the user-facing data model under the reference's module
path (reference src/muscle_synergies/vicon_data/user_data.py:42-772
defines ``ViconNexusData``, ``DeviceData``, ``Builder`` and the
frame/subframe trackers), so reference-era imports like
``from muscle_synergies.vicon_data.user_data import ViconNexusData``
keep working against the array-first implementations.
"""

from muscle_synergies_tpu.data import DeviceData, ViconNexusData
from muscle_synergies_tpu.frames import (
    ForcesEMGFrameTracker,
    FrameSubfr,
    TrajFrameTracker,
)

from .load_csv import Builder

__all__ = (
    "ViconNexusData",
    "DeviceData",
    "Builder",
    "ForcesEMGFrameTracker",
    "TrajFrameTracker",
    "FrameSubfr",
)
