"""Masked, batched preprocessing over padded ``(B, N, L)`` trial stacks.

The single-trial transforms in :mod:`muscle_synergies_tpu.ops.emg`
vmap directly for equal-length batches.  Ragged batches arrive
zero-padded with a ``(B, N)`` validity mask
(:func:`muscle_synergies_tpu.models.batch.pad_and_stack`), and the
transforms here are *exact* under that padding:

- ``zero_center``: means over valid samples only;
- ``moving_rms``: zero-padded "same" convolution is exactly the
  reference's edge behavior, and the padded region only reads zeros —
  identical to per-trial processing (output re-masked);
- ``time_normalize``: each trial's valid span maps onto [0, 1] using
  its own length, so every trial resamples from its true support;
- ``normalize``: padded zeros can never win a max-abs.

Zero-phase filtering is shape-exact only for equal-length trials (the
odd-reflection pad must touch the true last sample); the batched
envelope therefore takes the mask only to re-zero the padding, and
ragged captures should use the RMS path or per-length grouping.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .emg import linear_envelope as _linear_envelope_single
from .emg import moving_rms as _moving_rms_single

__all__ = [
    "zero_center_batch",
    "moving_rms_batch",
    "time_normalize_batch",
    "normalize_batch",
    "linear_envelope_batch",
]


def _lengths(mask: Optional[jnp.ndarray], xs: jnp.ndarray):
    if mask is None:
        b, n = xs.shape[0], xs.shape[1]
        return None, jnp.full((b,), n, dtype=xs.dtype)
    return mask, jnp.sum(mask, axis=1)


@functools.partial(jax.jit, static_argnames=())
def zero_center_batch(
    xs: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Subtract per-trial per-channel means over valid samples."""
    mask, lengths = _lengths(mask, xs)
    if mask is None:
        return xs - jnp.mean(xs, axis=1, keepdims=True)
    m = mask[..., None]
    means = jnp.sum(xs * m, axis=1, keepdims=True) / jnp.maximum(
        lengths[:, None, None], 1.0
    )
    return (xs - means) * m


@functools.partial(jax.jit, static_argnames=("window",))
def _moving_rms_batch_jit(xs, window, mask):
    out = jax.vmap(lambda x: _moving_rms_single(x, window))(xs)
    if mask is not None:
        out = out * mask[..., None]
        # The eager wrapper rejects windows longer than a trial; under
        # tracing that check cannot raise, so poison the offending
        # trials with NaN instead — a silent average over padding must
        # never look like a valid envelope (downstream NMF rejects
        # NaN inputs loudly).
        bad = jnp.sum(mask, axis=1) < window
        out = jnp.where(bad[:, None, None], jnp.nan, out)
    return out


def moving_rms_batch(
    xs: jnp.ndarray, window: int, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Reference-exact moving RMS over a padded batch.

    Raises:
        ValueError: when ``window`` exceeds any trial's *true* length
            (from ``mask``) — the per-trial API rejects such windows,
            and a padded batch must not silently average padding
            instead.  The check needs concrete mask values, so when
            tracing inside a caller's ``jax.jit`` it cannot raise;
            there the offending trials' outputs are NaN instead (the
            wrapper stays fully jittable, and a too-long window is
            loud either way).
    """
    if mask is not None:
        if not isinstance(mask, jax.core.Tracer):
            lengths = np.asarray(jnp.sum(mask, axis=1))
            if (lengths < window).any():
                shortest = int(lengths.min())
                raise ValueError(
                    f"window ({window} samples) is longer than the shortest "
                    f"trial ({shortest} valid samples)"
                )
    elif window > xs.shape[1]:
        raise ValueError(
            f"window ({window} samples) is longer than the signal "
            f"({xs.shape[1]} samples)"
        )
    return _moving_rms_batch_jit(xs, window, mask)


@functools.partial(jax.jit, static_argnames=("reduce_to",))
def time_normalize_batch(
    xs: jnp.ndarray,
    reduce_to: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Resample every trial's *valid* span onto ``reduce_to`` points.

    Each trial's source grid is ``arange(N) / (length - 1)``, so the
    query grid ``linspace(0, 1, reduce_to)`` only ever touches real
    samples (position 1.0 is exactly the trial's last valid sample).
    """
    _, lengths = _lengths(mask, xs)
    n = xs.shape[1]
    dst = jnp.linspace(0.0, 1.0, reduce_to)

    def one(x, length):
        src = jnp.arange(n, dtype=x.dtype) / jnp.maximum(length - 1.0, 1.0)

        def channel(col):
            return jnp.interp(dst, src, col)

        return jax.vmap(channel, in_axes=1, out_axes=1)(x)

    return jax.vmap(one)(xs, lengths)


@functools.partial(jax.jit, static_argnames=())
def normalize_batch(
    xs: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Per-trial per-channel max-abs normalization (padding-safe)."""
    denom = jnp.max(jnp.abs(xs), axis=1, keepdims=True)
    out = xs / jnp.where(denom == 0, 1.0, denom)
    if mask is not None:
        out = out * mask[..., None]
    return out


def linear_envelope_batch(
    xs: jnp.ndarray,
    critical_freqs: Union[float, Sequence[float]],
    sampling_frequency: float,
    order: int,
    mask: Optional[jnp.ndarray] = None,
    **kwargs,
) -> jnp.ndarray:
    """Vmapped linear envelope over a batch.

    Exact for equal-length trials; for ragged batches the zero-phase
    pad reflects around the padded edge, so prefer the RMS path or
    group trials by length (the mask only re-zeroes padding here).
    """
    out = jax.vmap(
        lambda x: _linear_envelope_single(
            x,
            critical_freqs=critical_freqs,
            sampling_frequency=sampling_frequency,
            order=order,
            **kwargs,
        )
    )(xs)
    if mask is not None:
        out = out * mask[..., None]
    return out
