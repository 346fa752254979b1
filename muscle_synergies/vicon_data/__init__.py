"""Compat facade for ``muscle_synergies.vicon_data``.

Mirrors the reference subpackage's public surface
(reference src/muscle_synergies/vicon_data/__init__.py: exports
``load_vicon_file``, ``ViconNexusData``, ``DeviceData``; its tests also
use ``DeviceType``).
"""

from muscle_synergies_tpu import (
    DeviceData,
    DeviceType,
    SamplingFreq,
    ViconCSVError,
    ViconNexusData,
    load_vicon_file,
)
from muscle_synergies_tpu.frames import (
    ForcesEMGFrameTracker,
    FrameSubfr,
    TrajFrameTracker,
)

__all__ = (
    "load_vicon_file",
    "ViconNexusData",
    "DeviceData",
    "DeviceType",
    "SamplingFreq",
    "ViconCSVError",
    "ForcesEMGFrameTracker",
    "TrajFrameTracker",
    "FrameSubfr",
)
