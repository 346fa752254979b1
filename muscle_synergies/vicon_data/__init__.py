"""Compat facade for ``muscle_synergies.vicon_data``.

Mirrors the reference subpackage's public surface
(reference src/muscle_synergies/vicon_data/__init__.py star-exports
the vocabulary, load entry points and data model; its tests also use
``DeviceType``).  The L0 vocabulary lives in
:mod:`muscle_synergies.vicon_data.definitions` and the DI-style
factories in :mod:`muscle_synergies.vicon_data.load_csv`, matching the
reference's module layout.
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

from . import definitions, load_csv
from .definitions import (
    ForcePlateMeasurement,
    Row,
    SectionType,
    ViconCSVLines,
)
from .load_csv import (
    Builder,
    Reader,
    create_builder,
    create_loading_run,
    create_reader,
    csv_row_stream,
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
    "Row",
    "SectionType",
    "ViconCSVLines",
    "ForcePlateMeasurement",
    "Reader",
    "Builder",
    "create_reader",
    "create_builder",
    "create_loading_run",
    "csv_row_stream",
    "definitions",
    "load_csv",
)
