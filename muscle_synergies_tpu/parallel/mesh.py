"""Device-mesh construction and sharding helpers.

The framework scales over TPU slices through ``jax.sharding``: a mesh
with a ``"data"`` axis (trials/subjects) and a ``"time"`` axis (the
long EMG sample dimension — the sequence-parallel axis).  The reference
has no distributed layer at all (SURVEY §2.5); every collective used by
the solvers goes through :mod:`muscle_synergies_tpu.parallel` so the
communication pattern is named, testable on a virtual CPU mesh, and
swappable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
TIME_AXIS = "time"
MODEL_AXIS = "model"

__all__ = [
    "DATA_AXIS",
    "TIME_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
]


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, TIME_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, time)`` mesh over the available devices.

    Args:
        shape: ``(n_data, n_time)``; defaults to all devices on the
            data axis (pure data parallelism).
        axis_names: names for the two axes.
        devices: devices to use (defaults to ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    n_data, n_time = shape
    if n_data * n_time != len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {n_data * n_time} devices, "
            f"got {len(devices)}"
        )
    grid = np.asarray(devices).reshape(n_data, n_time)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, time_sharded: bool = False) -> NamedSharding:
    """Sharding for a ``(B, N, L)`` trial batch.

    Trials spread over the ``data`` axis; with ``time_sharded`` the
    sample axis additionally splits over the ``time`` axis (sequence
    parallelism).
    """
    spec = PartitionSpec(
        DATA_AXIS, TIME_AXIS if time_sharded else None, None
    )
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding on the mesh."""
    return NamedSharding(mesh, PartitionSpec())
