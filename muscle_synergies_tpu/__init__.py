"""muscle_synergies_tpu: a TPU-native muscle-synergy analysis framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
reference ``muscle_synergies`` package (Vicon Nexus CSV ingest, EMG
preprocessing, NMF-based synergy extraction) re-designed TPU-first:
batched/sharded array pipelines, fused NMF solvers, and mesh-parallel
execution.
"""

from .data import DeviceData, DeviceType, ViconNexusData
from .frames import ForcesEMGFrameTracker, FrameSubfr, SamplingFreq, TrajFrameTracker
from .io import ViconCSVError, load_vicon_file

__version__ = "0.1.0"

__all__ = [
    "DeviceData",
    "DeviceType",
    "ViconNexusData",
    "SamplingFreq",
    "FrameSubfr",
    "ForcesEMGFrameTracker",
    "TrajFrameTracker",
    "load_vicon_file",
    "ViconCSVError",
]
