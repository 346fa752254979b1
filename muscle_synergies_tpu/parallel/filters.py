"""Time-sharded IIR filtering: exact sequence parallelism over a mesh.

The reference filters a 124k-sample EMG capture in one host
``sosfiltfilt`` call (reference analysis.py:417).  Here the time axis
shards across devices and each second-order section runs as:

1. every device computes its *local* cumulative affine state maps
   (the same parallel prefix used by the single-device scan in
   :mod:`muscle_synergies_tpu.ops.filters`);
2. the per-device boundary transforms — a 2x2 matrix and a 2-vector
   per channel, a few hundred bytes — are ``all_gather``-ed over the
   ``time`` axis;
3. each device composes the transforms of the devices before it to get
   its exact incoming filter state, then emits its block's output.

This reproduces the sequential recurrence exactly (up to float
reordering) with communication volume independent of sequence length —
the IIR analog of ring-attention-style sequence parallelism, but
without approximation.  Zero-phase filtering reuses the machinery
right-to-left; scipy's odd-reflection edge padding is evaluated on the
edge-owning devices and enters the sharded passes through per-section
initial states, so no resharding or ragged blocks are needed.

All loops over cascade sections and mesh neighbors are ``lax.scan`` /
``fori_loop``, keeping the compiled SPMD program size independent of
filter order and device count.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.filters import (
    _emit_output,
    _normalize_sos,
    _section_prefix,
    default_padlen,
    sosfilt_zi,
)
from .collectives import axis_index, axis_size, gather_time, mark_varying
from .mesh import TIME_AXIS

__all__ = ["sharded_sosfilt", "sharded_sosfiltfilt"]


def _compose_incoming(boundary, my_idx, n_dev, s_init, reverse: bool):
    """State entering this device: fold boundary transforms before it.

    ``boundary`` is the all-gathered per-device block transform
    ``(a11, a12, a21, a22, b1, b2)`` (leading axis = device).  Devices
    fold in processing order (device 0 first, or device ``n_dev-1``
    first when ``reverse``), starting from the global initial state
    ``s_init`` of shape ``(2, C)``.
    """
    a11, a12, a21, a22, b1, b2 = boundary

    def body(j, s):
        s1, s2 = s
        dev = (n_dev - 1 - j) if reverse else j
        applies = (j < (n_dev - 1 - my_idx)) if reverse else (j < my_idx)
        new_s1 = a11[dev] * s1 + a12[dev] * s2 + b1[dev]
        new_s2 = a21[dev] * s1 + a22[dev] * s2 + b2[dev]
        return (
            jnp.where(applies, new_s1, s1),
            jnp.where(applies, new_s2, s2),
        )

    s1, s2 = jax.lax.fori_loop(0, n_dev - 1, body, (s_init[0], s_init[1]))
    return jnp.stack([s1, s2])


def _section_block(x, coeffs, s_init, axis_name, reverse: bool):
    """One section over a time-sharded block (one tiny all_gather).

    ``s_init`` is the state entering the globally-first sample of the
    pass (the last device's block leads when ``reverse``).  Returns the
    local output block and this device's exit state.
    """
    if reverse:
        x = x[::-1]
    prefix = _section_prefix(x, coeffs)
    p11, p12, p21, p22, d1, d2 = prefix
    c = x.shape[1]
    ones = jnp.ones((c,), x.dtype)
    boundary_local = (
        p11[-1] * ones, p12[-1] * ones, p21[-1] * ones, p22[-1] * ones,
        d1[-1], d2[-1],
    )
    gathered = gather_time(boundary_local, axis_name)
    my_idx = axis_index(axis_name)
    n_dev = axis_size(axis_name)
    s_in = _compose_incoming(gathered, my_idx, n_dev, s_init, reverse)
    y, zf = _emit_output(x, coeffs, prefix, s_in)
    if reverse:
        y = y[::-1]
    return y, zf


def _sharded_pass(x, sos_j, entry_states, axis_name, reverse: bool):
    """Full cascade over sharded blocks (scan over sections).

    ``entry_states``: ``(n_sections, 2, C)``.  Returns the local output
    and this device's per-section exit states.
    """

    def body(y, sec):
        coeffs, s_init = sec
        y, zf = _section_block(y, coeffs, s_init, axis_name, reverse)
        return y, zf

    return jax.lax.scan(body, x, (sos_j, entry_states))


def _cascade_block(block, sos_j, entry_states):
    """Run a small local block through the whole cascade (no comm)."""

    def body(blk, sec):
        coeffs, s_init = sec
        prefix = _section_prefix(blk, coeffs)
        blk, zf = _emit_output(blk, coeffs, prefix, s_init)
        return blk, zf

    return jax.lax.scan(body, block, (sos_j, entry_states))


def _owned(states: jnp.ndarray, owner: int, axis_name: str) -> jnp.ndarray:
    """Broadcast ``(n_sections, 2, C)`` states from their owning device."""
    return gather_time(states, axis_name)[owner]


def sharded_sosfilt(
    sos: np.ndarray,
    x: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = TIME_AXIS,
) -> jnp.ndarray:
    """Causal SOS filtering of a time-sharded ``(N, C)`` signal.

    Equivalent to :func:`muscle_synergies_tpu.ops.filters.sosfilt` with
    zero initial state, with the time axis sharded over ``axis_name``.
    """
    sos_j = jnp.asarray(_normalize_sos(sos), dtype=x.dtype)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None),),
        out_specs=P(axis_name, None),
    )
    def run(xb):
        c = xb.shape[1]
        zeros = jnp.zeros((sos_j.shape[0], 2, c), xb.dtype)
        zeros = mark_varying(zeros, axis_name)
        y, _ = _sharded_pass(xb, sos_j, zeros, axis_name, reverse=False)
        return y

    return run(x)


def sharded_sosfiltfilt(
    sos: np.ndarray,
    x: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = TIME_AXIS,
    padlen: Optional[int] = None,
) -> jnp.ndarray:
    """Zero-phase SOS filtering of a time-sharded ``(N, C)`` signal.

    scipy-``sosfiltfilt`` semantics with the time axis sharded over
    ``axis_name``: the odd-reflection pads are built and forward
    filtered on the edge-owning devices, and only their per-section
    filter states cross devices.  ``padlen`` must be smaller than the
    per-device block length.
    """
    sos_np = _normalize_sos(sos)
    if padlen is None:
        padlen = default_padlen(sos_np)
    n_dev = mesh.shape[axis_name]
    n = x.shape[0]
    if n % n_dev != 0:
        raise ValueError(
            f"signal length {n} must divide evenly over {n_dev} devices"
        )
    if padlen >= n // n_dev:
        raise ValueError(
            f"padlen {padlen} must be smaller than the per-device block "
            f"({n // n_dev} samples)"
        )
    zi_unit = jnp.asarray(sosfilt_zi(sos_np), dtype=x.dtype)
    sos_j = jnp.asarray(sos_np, dtype=x.dtype)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None),),
        out_specs=P(axis_name, None),
    )
    def run(xb):
        # ---- forward: left pad, owned by device 0 ----
        left_pad = 2 * xb[0] - xb[padlen:0:-1]
        x0 = left_pad[0]
        pad_entry = zi_unit[:, :, None] * x0  # (n_sections, 2, C)
        _, fwd_states_local = _cascade_block(left_pad, sos_j, pad_entry)
        fwd_states = _owned(fwd_states_local, 0, axis_name)

        y, data_exit_local = _sharded_pass(
            xb, sos_j, fwd_states, axis_name, reverse=False
        )
        # per-section state at the global end of the data, owned by the
        # last device
        end_states = _owned(data_exit_local, -1, axis_name)

        # ---- forward-filter the right pad (raw x), then reverse it to
        # seed the backward pass; owned by the last device ----
        right_pad = 2 * xb[-1] - xb[-2 : -padlen - 2 : -1]
        fwd_right, _ = _cascade_block(right_pad, sos_j, end_states)
        y0 = fwd_right[-1]
        bwd_entry = zi_unit[:, :, None] * y0
        _, bwd_states_local = _cascade_block(fwd_right[::-1], sos_j, bwd_entry)
        bwd_states = _owned(bwd_states_local, -1, axis_name)

        # ---- backward pass over the data blocks ----
        out, _ = _sharded_pass(y, sos_j, bwd_states, axis_name, reverse=True)
        return out

    return run(x)
