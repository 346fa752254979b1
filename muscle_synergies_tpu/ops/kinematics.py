"""Kinematics and force-plate joint analysis.

Beyond-reference capability (BASELINE.json config 5 "kinematics/
force-plate joint analysis"): array transforms for the trajectory and
force-plate streams plus cross-rate alignment, so marker kinematics,
ground reactions and EMG synergies can be analyzed on a common time
base.

All functions are pure jnp on ``(N, ...)`` blocks and vmap over
devices/trials.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "finite_difference",
    "marker_velocity",
    "marker_acceleration",
    "marker_speed",
    "upsample_to_fast",
    "cop_path_length",
    "grf_impulse",
    "loading_rate",
]


def finite_difference(
    x: jnp.ndarray, sampling_frequency: float, order: int = 1
) -> jnp.ndarray:
    """Central-difference time derivative of a ``(N, D)`` block.

    Second-order accurate in the interior, one-sided at the edges —
    shape-preserving so derived signals stay frame-aligned.
    """
    x = jnp.asarray(x)
    out = x
    for _ in range(order):
        interior = (out[2:] - out[:-2]) * (sampling_frequency / 2.0)
        first = (out[1:2] - out[0:1]) * sampling_frequency
        last = (out[-1:] - out[-2:-1]) * sampling_frequency
        out = jnp.concatenate([first, interior, last], axis=0)
    return out


def marker_velocity(traj: jnp.ndarray, sampling_frequency: float) -> jnp.ndarray:
    """``(N, 3)`` velocity of one marker (units/s)."""
    return finite_difference(traj, sampling_frequency, order=1)


def marker_acceleration(
    traj: jnp.ndarray, sampling_frequency: float
) -> jnp.ndarray:
    """``(N, 3)`` acceleration of one marker (units/s^2)."""
    return finite_difference(traj, sampling_frequency, order=2)


def marker_speed(traj: jnp.ndarray, sampling_frequency: float) -> jnp.ndarray:
    """``(N,)`` scalar speed of one marker."""
    vel = marker_velocity(traj, sampling_frequency)
    return jnp.sqrt(jnp.sum(vel * vel, axis=-1))


def upsample_to_fast(
    slow: jnp.ndarray, num_subframes: int, num_fast: Optional[int] = None
) -> jnp.ndarray:
    """Resample a slow-rate block onto the fast (forces/EMG) time base.

    Linear interpolation against the framework's frame/subframe
    alignment: slow sample ``f`` (frame ``f+1``) sits at fast index
    ``f * num_subframes`` (both streams' first samples coincide at
    frame 1, subframe 0).

    Args:
        slow: ``(N_slow, D)`` trajectory-rate block.
        num_subframes: fast samples per frame
            (``SamplingFreq.num_subframes``).
        num_fast: output length (defaults to ``N_slow * num_subframes``).
    """
    slow = jnp.asarray(slow)
    n_slow = slow.shape[0]
    if num_fast is None:
        num_fast = n_slow * num_subframes
    src = jnp.arange(n_slow, dtype=jnp.result_type(slow.dtype, jnp.float32))
    dst = (
        jnp.arange(num_fast, dtype=src.dtype) / num_subframes
    )

    def channel(col):
        return jnp.interp(dst, src, col)

    if slow.ndim == 1:
        return channel(slow)
    return jax.vmap(channel, in_axes=1, out_axes=1)(slow)


def cop_path_length(cop: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
    """Total center-of-pressure excursion of a ``(N, 2|3)`` CoP track.

    ``mask`` (``(N,)``) restricts to loaded samples (e.g. one phase).
    """
    cop = jnp.asarray(cop)
    steps = jnp.sqrt(jnp.sum((cop[1:] - cop[:-1]) ** 2, axis=-1))
    if mask is not None:
        both = mask[1:] * mask[:-1]
        steps = steps * both
    return jnp.sum(steps)


def grf_impulse(
    force: jnp.ndarray,
    sampling_frequency: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Trapezoidal impulse of a ``(N,)`` or ``(N, D)`` reaction (N*s)."""
    force = jnp.asarray(force)
    if mask is not None:
        shape = (-1,) + (1,) * (force.ndim - 1)
        force = force * mask.reshape(shape)
    mids = 0.5 * (force[1:] + force[:-1])
    return jnp.sum(mids, axis=0) / sampling_frequency


def loading_rate(
    fz: jnp.ndarray,
    sampling_frequency: float,
    window: int = 5,
) -> jnp.ndarray:
    """Peak rate of change of vertical ground reaction (N/s).

    The derivative is smoothed with a ``window``-sample moving average
    before taking the max magnitude, the usual definition for impact
    loading analysis.
    """
    dfz = finite_difference(fz[:, None], sampling_frequency)[:, 0]
    kernel = jnp.ones((window,), dfz.dtype) / window
    smooth = jnp.convolve(dfz, kernel, mode="same")
    return jnp.max(jnp.abs(smooth))
