"""Named collective operations used by the solvers.

SURVEY §5 (distributed backend): every collective the framework emits
goes through this thin module so the communication surface is
enumerable, individually testable on a CPU mesh, and swappable (e.g.
to insert instrumentation or alternative implementations).

All functions are shard_map-internal primitives operating on local
shards with a mesh axis name.
"""

from __future__ import annotations

import jax

__all__ = [
    "axis_sum",
    "time_sum",
    "gather_time",
    "axis_index",
    "axis_size",
    "ring_shift",
    "edge_shift",
    "mark_varying",
]


def axis_sum(x, axis_name: str):
    """Sum local contributions over a mesh axis (``psum``).

    Used for: time-reduced NMF Grams (``Wt X``, ``Wt W``),
    channel-reduced Grams in the tensor-parallel solver, and
    convergence errors in the sharded solvers.
    """
    return jax.lax.psum(x, axis_name)


# historical name from the sequence-parallel solvers
time_sum = axis_sum


def gather_time(x, axis_name: str):
    """All-gather tiny per-device payloads over a mesh axis.

    Used for: per-device boundary state transforms and edge pad states
    in the sequence-parallel filters.
    """
    return jax.lax.all_gather(x, axis_name)


def axis_index(axis_name: str):
    """This device's position along a mesh axis."""
    return jax.lax.axis_index(axis_name)


def axis_size(axis_name: str):
    """Number of devices along a mesh axis."""
    return jax.lax.axis_size(axis_name)


def ring_shift(x, axis_name: str, shift: int = 1):
    """Rotate shards around a mesh axis (``ppermute`` ring).

    Available for halo-exchange style patterns (e.g. overlap regions of
    FIR windows); the IIR filters use boundary-transform gathers
    instead because their halo is state-sized, not window-sized.
    """
    n = axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def edge_shift(x, axis_name: str, shift: int = 1):
    """Shift shards along a mesh axis WITHOUT wraparound.

    Devices with no source (the first ``shift`` devices for a positive
    shift, the last for a negative one) receive zeros — ``ppermute``'s
    fill for absent sources, which is exactly the zero-padded boundary
    the convolutive model's causal shifts define.  Used for: lag halos
    in the sequence-parallel convolutive NMF.
    """
    n = axis_size(axis_name)
    if shift >= 0:
        perm = [(i, i + shift) for i in range(n - shift)]
    else:
        perm = [(i, i + shift) for i in range(-shift, n)]
    return jax.lax.ppermute(x, axis_name, perm)


def mark_varying(x, axis_name: str):
    """Mark a freshly created array as varying over a mesh axis.

    Required for while_loop carries initialized inside ``shard_map``.
    """
    return jax.lax.pcast(x, (axis_name,), to="varying")
