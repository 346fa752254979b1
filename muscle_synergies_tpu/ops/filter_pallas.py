"""Fused zero-phase IIR filtering as a Pallas TPU kernel.

The blocked associative scan in :mod:`muscle_synergies_tpu.ops.filters`
runs a full-trial (124k x 8) ``sosfiltfilt`` in ~4 ms, but it is
O(N log N) work and materializes six cumulative-map arrays per section
in HBM.  This kernel is O(N) and keeps the whole signal resident in
VMEM across the cascade:

- **chunks-on-lanes layout**: time splits into ``M`` chunks that ride
  the 1024 VPU lanes (an ``(8, 128)`` vreg), channels minor — each
  sequential step updates the filter state of every chunk at once, so
  the recurrence costs ``ceil(N/M)`` steps instead of ``N``;
- **pass 1** runs each chunk's second-order-section recurrence from a
  zero state, yielding the chunk's data-dependent boundary offset
  ``d_tot`` (the matrix part ``A^L`` is data-independent and
  precomputed host-side in float64);
- **chunk composition** is a lanewise log-doubling affine prefix:
  ``ceil(log2 M)`` unrolled steps of ``pltpu.roll`` by ``2^t`` chunks
  plus iota masking compose every chunk's exact entry state — the same
  boundary-transform algebra the mesh-sharded filter uses across
  devices (:mod:`muscle_synergies_tpu.parallel.filters`), collapsed
  onto lanes;
- **pass 2** re-runs the recurrence from the composed entry states,
  emitting the section output in place; the next section consumes it
  directly from VMEM.

Zero-phase semantics are exactly scipy's (odd/even/constant edge
extension, steady-state ``zi`` scaled by the first sample of each
pass), shared with :func:`muscle_synergies_tpu.ops.filters.sosfiltfilt`
via the same helpers.  Capability parity target: the reference's
``scipy.signal.sosfiltfilt`` hot path (reference analysis.py:404-418).

Mosaic notes (see CLAUDE.md): loop carries start lane-varying by
feeding zeros through a VMEM operand; masks are arithmetic (dtype 0/1
multiplies), not selects against replicated scalars.

Roofline audit (full trial, 124,460 x 8 @ 2 sections): the
transposed-direct-form-II recurrence costs ~5 FMAs per sample per
section per pass, so the whole zero-phase cascade is only
~2 x 2 x 124.5k x 8 x 10 ≈ **40 MFLOP — trivially far from any FLOP
roofline**.  The binding resource is the *sequential dependency
chain*: with 1024 chunks on lanes each pass runs ceil(N/1024) ≈ 122
dependent recurrence steps, ~500 across the cascade (plus ~10
log-doubling composition steps), and the measured ~0.4 ms is
~0.8 µs per step — the latency of one ~5-op dependent vector chain on
(8, 128) vregs plus loop overhead, with every lane busy.  Wall time
therefore scales as N/1024, not N; more FLOP-efficiency is not
available without deepening the chunk parallelism, which is already
at the vreg width.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import (
    _EXTENSIONS,
    _as_2d,
    _normalize_sos,
    _resolve_padding,
    sosfilt_zi,
)

__all__ = ["sosfiltfilt_pallas", "cascade_pallas", "pallas_eligible"]

_SUB, _LANE = 8, 128  # one f32 vreg
_V = _SUB * _LANE  # total lanes carrying chunks

# in + out VMEM blocks must fit comfortably under the ~16 MB/core VMEM
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def pallas_eligible(x: jnp.ndarray, padlen: int) -> bool:
    """Whether the fused kernel can (profitably) run this problem.

    Requires the TPU backend, float32 data (the kernel's vreg layout is
    tuned for the (8, 128) f32 tile), at most 128 channels, and a
    padded signal whose in+out VMEM blocks fit the budget.
    """
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 2 or x.dtype != jnp.float32:
        return False
    n, c = x.shape
    if c > _LANE:
        return False
    c_eff = _pad_channels(c)
    ne = n + 2 * padlen
    return ne * c_eff * 4 * 2 <= _VMEM_BUDGET_BYTES


def _section_mats(sos: np.ndarray, lc: int, n_pow: int):
    """Per-section coefficients and chunk-composition matrix powers.

    Returns ``(coeffs, pows)`` where ``coeffs[s] = (b0, b1, b2, a1,
    a2)`` and ``pows[s][t]`` is ``(A^lc)^(2^t)`` as a flat 4-tuple —
    all plain floats computed in float64 so they bake into the kernel
    as compile-time constants.
    """
    coeffs = []
    pows = []
    for b0, b1, b2, _, a1, a2 in np.asarray(sos, dtype=np.float64):
        coeffs.append((float(b0), float(b1), float(b2), float(a1), float(a2)))
        a_mat = np.array([[-a1, 1.0], [-a2, 0.0]])
        p = np.linalg.matrix_power(a_mat, lc)
        sec_pows = []
        for _t in range(n_pow):
            sec_pows.append(tuple(float(v) for v in p.ravel()))
            p = p @ p
        pows.append(tuple(sec_pows))
    return tuple(coeffs), tuple(pows)


def _flat_roll(d, k_chunks: int, c: int, lane_ids):
    """Roll ``d`` by ``k_chunks`` chunks along the flattened lane order.

    Chunk ``m`` receives chunk ``m - k``'s value (wraparound garbage is
    masked by the caller); negative ``k`` rolls the other way.  A flat
    roll decomposes into a lane roll plus sublane rolls, with the first
    ``r % 128`` lanes of each row carrying from one extra row up.
    """
    r = (k_chunks * c) % _V
    if r == 0:
        return d
    lane_r = r % _LANE
    sub_r = r // _LANE
    if lane_r == 0:
        return pltpu.roll(d, sub_r, axis=0)
    a = pltpu.roll(d, lane_r, axis=1)
    b = pltpu.roll(a, sub_r, axis=0) if sub_r else a
    carried = pltpu.roll(a, sub_r + 1, axis=0)
    # arithmetic select: the first lane_r lanes take the row-carried
    # value (Mosaic cannot relayout a select against a replicated
    # scalar, so masks are dtype multiplies)
    first = (lane_ids < lane_r).astype(d.dtype)
    return carried * first + b * (1.0 - first)


def _cascade_in_place(
    out_ref, zeros, seeds, coeffs, pows, lc: int, c: int, reverse: bool
):
    """Run a full SOS cascade over the chunked block in ``out_ref``.

    ``seeds`` is a list of per-section ``(plane1, plane2)`` pairs: the
    section's entry state placed in the lanes of the first-processed
    chunk (chunk 0 forward, chunk M-1 when ``reverse``) and zero
    elsewhere.  ``reverse=True`` runs the anti-causal direction with no
    data movement: rows sweep bottom-up and the chunk-boundary prefix
    composes right-to-left.
    """
    dtype = out_ref.dtype
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    per_row = _LANE // c
    chunk_ids = sub_ids * per_row + lane_ids // c
    m = _SUB * per_row
    n_pow = len(pows[0])
    n_sections = len(coeffs)

    sgn = -1 if reverse else 1
    first_chunk = m - 1 if reverse else 0
    not_first = 1.0 - (chunk_ids == first_chunk).astype(dtype)

    def row(i):
        return lc - 1 - i if reverse else i

    def compose_entry(d1, d2, s_idx):
        """Chunk entry states from zero-init boundary offsets ``d``.

        Shift the offsets one chunk along the processing order and drop
        the seed into the first-processed chunk's lanes; the inclusive
        log-doubling prefix (with host-precomputed powers of ``A^lc``)
        then lands every chunk's exact entry state.
        """
        p1, p2 = seeds[s_idx]
        d1 = _flat_roll(d1, sgn, c, lane_ids) * not_first + p1
        d2 = _flat_roll(d2, sgn, c, lane_ids) * not_first + p2
        for t in range(n_pow):
            k = 1 << t
            if k >= m:
                break
            p11, p12, p21, p22 = pows[s_idx][t]
            e1 = _flat_roll(d1, sgn * k, c, lane_ids)
            e2 = _flat_roll(d2, sgn * k, c, lane_ids)
            if reverse:
                valid = (chunk_ids <= m - 1 - k).astype(dtype)
            else:
                valid = (chunk_ids >= k).astype(dtype)
            d1 = d1 + (p11 * e1 + p12 * e2) * valid
            d2 = d2 + (p21 * e1 + p22 * e2) * valid
        return d1, d2

    # ---- prologue: section 0's zero-init offsets (plain pass 1) ----
    b0, b1, b2, a1, a2 = coeffs[0]
    bb1, bb2 = b1 - a1 * b0, b2 - a2 * b0

    def pass1(i, carry, bb1=bb1, bb2=bb2, a1=a1, a2=a2):
        s1, s2 = carry
        xi = out_ref[row(i)]
        return (-a1 * s1 + s2 + bb1 * xi, -a2 * s1 + bb2 * xi)

    d1, d2 = jax.lax.fori_loop(0, lc, pass1, (zeros, zeros))

    # ---- steady state: emit section s while accumulating section
    # s+1's zero-init offsets from the freshly-written rows, so each
    # section costs one sequential sweep instead of two ----
    for s_idx in range(n_sections - 1):
        d1, d2 = compose_entry(d1, d2, s_idx)
        b0, b1, b2, a1, a2 = coeffs[s_idx]
        bb1, bb2 = b1 - a1 * b0, b2 - a2 * b0
        nb0, nb1, nb2, na1, na2 = coeffs[s_idx + 1]
        nbb1, nbb2 = nb1 - na1 * nb0, nb2 - na2 * nb0

        def fused(
            i, carry,
            b0=b0, bb1=bb1, bb2=bb2, a1=a1, a2=a2,
            nbb1=nbb1, nbb2=nbb2, na1=na1, na2=na2,
        ):
            s1, s2, t1, t2 = carry
            ri = row(i)
            xi = out_ref[ri]
            yi = b0 * xi + s1
            out_ref[ri] = yi
            return (
                -a1 * s1 + s2 + bb1 * xi,
                -a2 * s1 + bb2 * xi,
                -na1 * t1 + t2 + nbb1 * yi,
                -na2 * t1 + nbb2 * yi,
            )

        _, _, d1, d2 = jax.lax.fori_loop(
            0, lc, fused, (d1, d2, zeros, zeros)
        )

    # ---- epilogue: last section's emit-only pass ----
    d1, d2 = compose_entry(d1, d2, n_sections - 1)
    b0, b1, b2, a1, a2 = coeffs[-1]
    bb1, bb2 = b1 - a1 * b0, b2 - a2 * b0

    def pass2(i, carry, b0=b0, bb1=bb1, bb2=bb2, a1=a1, a2=a2):
        s1, s2 = carry
        ri = row(i)
        xi = out_ref[ri]
        out_ref[ri] = b0 * xi + s1
        return (-a1 * s1 + s2 + bb1 * xi, -a2 * s1 + bb2 * xi)

    jax.lax.fori_loop(0, lc, pass2, (d1, d2))


def _cascade_kernel(
    x_ref,
    seed_ref,
    zero_ref,
    out_ref,
    *,
    coeffs,
    pows,
    lc: int,
    c: int,
):
    """Causal SOS cascade over a chunked ``(lc, 8, 128)`` block."""
    out_ref[:] = x_ref[:]
    seeds = [
        (seed_ref[s, 0], seed_ref[s, 1]) for s in range(len(coeffs))
    ]
    _cascade_in_place(
        out_ref, zero_ref[:], seeds, coeffs, pows, lc, c, reverse=False
    )


def _filtfilt_kernel(
    x_ref,
    seed_ref,
    zero_ref,
    out_ref,
    *,
    coeffs,
    pows,
    ziu,
    lc: int,
    c: int,
):
    """Whole zero-phase filtfilt in one program: forward cascade, then
    the anti-causal cascade in place with no data reversal.

    The backward seeds are scipy's ``zi_unit * y_forward[-1]``: the
    forward output's last sample already sits in the last-processed
    chunk's lanes of the last row, which is exactly where the reversed
    composition wants its seed — so seeding is a mask-and-scale, not a
    shuffle.  ``ziu`` is the host-computed ``sosfilt_zi`` table as
    plain floats.
    """
    dtype = out_ref.dtype
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    per_row = _LANE // c
    chunk_ids = sub_ids * per_row + lane_ids // c
    m = _SUB * per_row

    out_ref[:] = x_ref[:]
    zeros = zero_ref[:]
    n_sections = len(coeffs)

    seeds_fwd = [(seed_ref[s, 0], seed_ref[s, 1]) for s in range(n_sections)]
    _cascade_in_place(
        out_ref, zeros, seeds_fwd, coeffs, pows, lc, c, reverse=False
    )

    last = out_ref[lc - 1]
    mask_last = (chunk_ids == m - 1).astype(dtype)
    y_last = last * mask_last
    seeds_bwd = [
        (ziu[s][0] * y_last, ziu[s][1] * y_last) for s in range(n_sections)
    ]
    _cascade_in_place(
        out_ref, zeros, seeds_bwd, coeffs, pows, lc, c, reverse=True
    )


def _pad_channels(c: int) -> int:
    """Pad the channel count to a power of two dividing one row."""
    c_eff = 1
    while c_eff < c:
        c_eff *= 2
    if c_eff > _LANE:
        raise ValueError(f"at most {_LANE} channels supported, got {c}")
    return c_eff


def _make_apply(sos: np.ndarray, ne: int, c: int, dtype, interpret: bool):
    """Trace-time builder: returns ``apply(x_ext, seeds) -> y_ext``.

    ``apply`` runs the chunk/un-chunk relayout and one fused-cascade
    pallas_call; it is meant to be called *inside* an enclosing jit so
    both filtfilt directions compile into a single program.
    """
    n_sections = sos.shape[0]
    c_eff = _pad_channels(c)
    per_row = _LANE // c_eff
    m = _SUB * per_row
    lc = -(-ne // m)
    n_pow = max(1, m.bit_length() - 1)
    coeffs, pows = _section_mats(sos, lc, n_pow)

    kernel = functools.partial(
        _cascade_kernel, coeffs=coeffs, pows=pows, lc=lc, c=c_eff
    )

    def apply(x, seeds):
        # (ne, c) -> zero-pad -> (m, lc, c_eff) -> chunks on lanes
        x_p = jnp.pad(x, ((0, lc * m - ne), (0, c_eff - c)))
        xt = (
            x_p.reshape(m, lc, c_eff)
            .transpose(1, 0, 2)
            .reshape(lc, _SUB, _LANE)
        )
        # per-section seeds live in chunk 0's lanes of an (8, 128) plane
        seeds_p = jnp.pad(seeds, ((0, 0), (0, 0), (0, c_eff - c)))
        planes = jnp.zeros((n_sections, 2, _SUB, _LANE), dtype)
        planes = planes.at[:, :, 0, :c_eff].set(seeds_p.astype(dtype))
        zeros = jnp.zeros((_SUB, _LANE), dtype)

        yt = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((lc, _SUB, _LANE), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xt.astype(dtype), planes, zeros)

        y = (
            yt.reshape(lc, m, c_eff)
            .transpose(1, 0, 2)
            .reshape(lc * m, c_eff)
        )
        return y[:ne, :c]

    return apply


@functools.lru_cache(maxsize=64)
def _build_cascade(
    sos_bytes: bytes,
    n_sections: int,
    ne: int,
    c: int,
    dtype_str: str,
    interpret: bool,
):
    """Compile a causal-cascade runner for one (sos, length, channels) key."""
    sos = np.frombuffer(sos_bytes, dtype=np.float64).reshape(n_sections, 6)
    apply = _make_apply(sos, ne, c, jnp.dtype(dtype_str), interpret)
    return jax.jit(apply)


@functools.lru_cache(maxsize=64)
def _build_filtfilt(
    sos_bytes: bytes,
    n_sections: int,
    n: int,
    c: int,
    padlen: int,
    padtype: Optional[str],
    dtype_str: str,
    interpret: bool,
):
    """Compile a whole-filtfilt runner: ONE kernel does both directions.

    The buffer is rounded up to a full chunk grid by *prepending*
    constant ``ext[0]`` samples: ``sosfilt_zi`` states are stationary
    under constant input, so the forward pass enters the real extension
    with exactly scipy's state, no masking of invalid rows is ever
    needed, and the anti-causal pass starts exactly at the buffer's
    last sample.
    """
    sos = np.frombuffer(sos_bytes, dtype=np.float64).reshape(n_sections, 6)
    dtype = jnp.dtype(dtype_str)
    ne = n + 2 * padlen

    c_eff = _pad_channels(c)
    per_row = _LANE // c_eff
    m = _SUB * per_row
    extra = (-ne) % m
    total = ne + extra
    lc = total // m
    n_pow = max(1, m.bit_length() - 1)
    coeffs, pows = _section_mats(sos, lc, n_pow)
    zi_np = sosfilt_zi(sos)
    ziu = tuple((float(z1), float(z2)) for z1, z2 in zi_np)
    zi_unit = jnp.asarray(zi_np, dtype=dtype)

    kernel = functools.partial(
        _filtfilt_kernel, coeffs=coeffs, pows=pows, ziu=ziu, lc=lc, c=c_eff
    )

    @jax.jit
    def run(x):
        ext = (
            _EXTENSIONS[padtype](x, padlen) if padtype is not None else x
        )
        lead = jnp.broadcast_to(ext[0], (extra, c))
        buf = jnp.concatenate([lead, ext], axis=0)
        buf = jnp.pad(buf, ((0, 0), (0, c_eff - c))).astype(dtype)
        xt = (
            buf.reshape(m, lc, c_eff)
            .transpose(1, 0, 2)
            .reshape(lc, _SUB, _LANE)
        )
        seeds = (zi_unit[:, :, None] * ext[0]).astype(dtype)
        seeds = jnp.pad(seeds, ((0, 0), (0, 0), (0, c_eff - c)))
        planes = jnp.zeros((n_sections, 2, _SUB, _LANE), dtype)
        planes = planes.at[:, :, 0, :c_eff].set(seeds)
        zeros = jnp.zeros((_SUB, _LANE), dtype)

        yt = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((lc, _SUB, _LANE), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xt, planes, zeros)

        y = (
            yt.reshape(lc, m, c_eff)
            .transpose(1, 0, 2)
            .reshape(total, c_eff)
        )
        return y[extra + padlen : extra + padlen + n, :c]

    return run


def cascade_pallas(
    sos: np.ndarray,
    x: jnp.ndarray,
    zi: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal SOS-cascade filtering of ``(N, C)`` via the fused kernel.

    Equivalent to :func:`muscle_synergies_tpu.ops.filters.sosfilt` with
    per-section initial states ``zi`` of shape ``(n_sections, 2, C)``.
    """
    sos_np = _normalize_sos(sos)
    x = jnp.asarray(x)
    ne, c = x.shape
    run = _build_cascade(
        sos_np.tobytes(), sos_np.shape[0], ne, c, str(x.dtype), interpret
    )
    return run(x, jnp.asarray(zi, dtype=x.dtype))


def sosfiltfilt_pallas(
    sos: np.ndarray,
    x: jnp.ndarray,
    padtype: Optional[str] = "odd",
    padlen: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Zero-phase filtering via the fused VMEM kernel (scipy semantics).

    Drop-in for :func:`muscle_synergies_tpu.ops.filters.sosfiltfilt`
    (same edge extension and ``zi`` seeding) with the forward and
    backward passes each running as one fused Pallas program.  Supports
    up to 128 channels; the signal (plus pads) must fit VMEM —
    ~500k samples x 8 channels in float32.
    """
    x2, squeeze = _as_2d(x)
    sos_np = _normalize_sos(sos)
    padlen = _resolve_padding(sos_np, x2.shape[0], padtype, padlen)
    run = _build_filtfilt(
        sos_np.tobytes(),
        sos_np.shape[0],
        x2.shape[0],
        x2.shape[1],
        int(padlen),
        padtype if padlen > 0 else None,
        str(x2.dtype),
        interpret,
    )
    y = run(x2)
    return y[:, 0] if squeeze else y
