"""Ingest layer: Vicon Nexus CSV parsing and trial batching."""

from .vicon import ViconCSVError, load_vicon_file

__all__ = ["load_vicon_file", "ViconCSVError"]
