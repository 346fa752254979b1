"""Mesh-sharded NMF: data-parallel trials x time-sharded samples.

The sharded multiplicative update is the sequence-parallel analog of
the solver in :mod:`muscle_synergies_tpu.models.mu` and is *exact*, not
approximate (SURVEY §5 "long-context" requirement):

- ``X`` and ``W`` are sharded ``(data, time)`` — each device owns a
  slice of the trial batch and a contiguous block of each trial's
  samples.  ``H`` is replicated within a time group.
- The W update is embarrassingly local: its numerator ``X Ht`` and
  denominator ``W (H Ht)`` involve only the device's own sample rows.
- The H update needs the time-reduced Grams ``Wt X`` and ``Wt W``;
  each device contributes its local partial product and a ``psum``
  over the ``time`` axis completes them — the NMF equivalent of
  sequence-parallel attention's collective.
- Convergence (Frobenius error) is likewise a time-``psum`` of local
  squared residuals, so every device in a time group sees the same
  stopping decision; different data shards may stop at different
  iteration counts independently.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mu import EPSILON, MUState
from .collectives import mark_varying, time_sum
from .mesh import DATA_AXIS, TIME_AXIS

__all__ = ["sharded_mu_step", "sharded_fit_mu"]


def _local_mu_step(x, w, h, axis_name: str):
    """One MU iteration on local shards; Grams psum'd over ``axis_name``.

    Shapes (local): x ``(b, n_loc, L)``, w ``(b, n_loc, k)``,
    h ``(b, k, L)`` (replicated over the time group).
    """
    ht = jnp.swapaxes(h, -1, -2)
    # --- W update: fully local ---
    numerator = x @ ht
    denominator = w @ (h @ ht)
    denominator = jnp.where(denominator == 0, EPSILON, denominator)
    w = w * (numerator / denominator)

    # --- H update: time-reduced Grams ---
    wt = jnp.swapaxes(w, -1, -2)
    wtx = time_sum(wt @ x, axis_name)
    wtw = time_sum(wt @ w, axis_name)
    denominator = wtw @ h
    denominator = jnp.where(denominator == 0, EPSILON, denominator)
    h = h * (wtx / denominator)
    return w, h


def _local_error(x, w, h, axis_name: str):
    """Per-trial Frobenius error with the sum-of-squares psum'd."""
    diff = x - w @ h
    sq = time_sum(jnp.sum(diff * diff, axis=(-1, -2)), axis_name)
    return jnp.sqrt(sq)


def sharded_mu_step(
    x: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One sharded MU iteration over a ``(data, time)`` mesh.

    Args:
        x: ``(B, N, L)`` batch, sharded ``P(data, time, None)``.
        w: ``(B, N, k)`` factors, sharded like ``x``.
        h: ``(B, k, L)`` factors, sharded ``P(data, None, None)``.

    Returns:
        ``(w, h, error)`` with ``error`` the per-trial Frobenius error
        after the update.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, TIME_AXIS, None),
            P(DATA_AXIS, TIME_AXIS, None),
            P(DATA_AXIS, None, None),
        ),
        out_specs=(
            P(DATA_AXIS, TIME_AXIS, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS),
        ),
    )
    def step(xb, wb, hb):
        wb, hb = _local_mu_step(xb, wb, hb, TIME_AXIS)
        err = _local_error(xb, wb, hb, TIME_AXIS)
        return wb, hb, err

    return step(x, w, h)


def sharded_fit_mu(
    x: jnp.ndarray,
    w0: jnp.ndarray,
    h0: jnp.ndarray,
    mesh: Mesh,
    max_iter: int = 200,
    tol: float = 1e-4,
    check_every: int = 10,
) -> MUState:
    """Run MU-NMF to convergence on a ``(data, time)`` mesh.

    Semantics match :func:`muscle_synergies_tpu.models.mu.fit_mu`
    (sklearn's stopping rule, checked every ``check_every``
    iterations), with all time reductions as ``psum`` collectives.
    The convergence loop runs *inside* ``shard_map``, so the whole fit
    is one compiled program per device with zero host round-trips.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, TIME_AXIS, None),
            P(DATA_AXIS, TIME_AXIS, None),
            P(DATA_AXIS, None, None),
        ),
        out_specs=MUState(
            w=P(DATA_AXIS, TIME_AXIS, None),
            h=P(DATA_AXIS, None, None),
            n_iter=P(DATA_AXIS),
            previous_error=P(DATA_AXIS),
            converged=P(DATA_AXIS),
        ),
    )
    def fit(xb, wb, hb):
        b = xb.shape[0]
        error_at_init = _local_error(xb, wb, hb, TIME_AXIS)

        def chunk(state: MUState) -> MUState:
            steps = jnp.minimum(check_every, max_iter - jnp.max(state.n_iter))

            def body(_, carry):
                w, h = carry
                w_new, h_new = _local_mu_step(xb, w, h, TIME_AXIS)
                # freeze converged trials
                keep = state.converged[:, None, None]
                return (
                    jnp.where(keep, w, w_new),
                    jnp.where(keep, h, h_new),
                )

            w, h = jax.lax.fori_loop(0, steps, body, (state.w, state.h))
            n_iter = jnp.where(state.converged, state.n_iter, state.n_iter + steps)
            error = _local_error(xb, w, h, TIME_AXIS)
            at_checkpoint = n_iter % check_every == 0
            newly = jnp.logical_and(
                (state.previous_error - error) / error_at_init < tol,
                at_checkpoint,
            )
            converged = jnp.logical_or(state.converged, newly)
            previous_error = jnp.where(state.converged, state.previous_error, error)
            return MUState(w, h, n_iter, previous_error, converged)

        def cond(state: MUState) -> jnp.ndarray:
            return jnp.logical_and(
                jnp.max(state.n_iter) < max_iter,
                ~jnp.all(state.converged),
            )

        # Freshly-created carry entries must be marked as varying over
        # the data axis (their loop-carried updates depend on this
        # shard's trials), or shard_map's varying-axis check rejects
        # the while_loop.
        init = MUState(
            w=wb,
            h=hb,
            n_iter=mark_varying(jnp.zeros((b,), jnp.int32), DATA_AXIS),
            previous_error=error_at_init,
            converged=mark_varying(jnp.zeros((b,), bool), DATA_AXIS),
        )
        return jax.lax.while_loop(cond, chunk, init)

    return fit(x, w0, h0)
