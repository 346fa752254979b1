"""Synergy stability and principled rank selection.

Beyond-reference capability (BASELINE.json config 5): the reference
selects rank by eyeballing VAF sweeps only.  This module adds:

- :func:`bootstrap_synergies`: refit NMF on bootstrap resamples of the
  time axis — **as one vmapped batch** — and score each reference
  component's stability as its best-matching cosine similarity across
  resamples (Hungarian matching per resample);
- :func:`fit_mu_masked`: weighted (masked) multiplicative updates,
  the EM treatment of missing entries:
  ``W *= ((M*X) Ht) / ((M*(WH)) Ht)`` and symmetrically for H;
- :func:`cv_rank_selection`: Wold-style cross-validation — hold out
  random matrix entries, fit on the rest with masked MU, score the
  held-out reconstruction error per rank.  All ``(repeat, rank)``
  fits run in a single vmapped computation via rank zero-padding.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .init import initialize_nmf
from .mu import EPSILON, MUState
from .batch import _pad_rank

__all__ = [
    "bootstrap_synergies",
    "BootstrapResult",
    "fit_mu_masked",
    "cv_rank_selection",
    "CVResult",
]


# ---------------------------------------------------------------------------
# bootstrap stability
# ---------------------------------------------------------------------------

@dataclass
class BootstrapResult:
    """Per-component stability of a synergy factorization.

    Attributes:
        reference_components: ``(k, L)`` components of the full fit.
        similarities: ``(n_boot, k)`` matched cosine similarity of each
            reference component in each bootstrap refit.
        mean / std: per-component summary across resamples.
    """

    reference_components: np.ndarray
    similarities: np.ndarray

    @property
    def mean(self) -> np.ndarray:
        return self.similarities.mean(axis=0)

    @property
    def std(self) -> np.ndarray:
        return self.similarities.std(axis=0)


def _match_components(h_ref: np.ndarray, h_boot: np.ndarray) -> np.ndarray:
    """Best-assignment cosine similarity of each reference component."""
    from scipy.optimize import linear_sum_assignment

    def normalize(h):
        norm = np.linalg.norm(h, axis=1, keepdims=True)
        return h / np.where(norm == 0, 1.0, norm)

    sim = normalize(h_ref) @ normalize(h_boot).T  # (k, k)
    rows, cols = linear_sum_assignment(-sim)
    matched = np.zeros(h_ref.shape[0])
    matched[rows] = sim[rows, cols]
    return matched


def bootstrap_synergies(
    x,
    n_components: int,
    n_boot: int = 50,
    seed: int = 0,
    init: Optional[str] = None,
    max_iter: int = 500,
    tol: float = 1e-6,
) -> BootstrapResult:
    """Bootstrap the time axis and measure component stability.

    All resamples factorize in one vmapped solver call; only the
    k x k component matching runs on host.
    """
    from .batch import fit_mu_batch, init_batch

    x = jnp.asarray(np.asarray(x, dtype=float))
    n = x.shape[0]

    # full fit = reference components
    w0, h0 = initialize_nmf(x, n_components, init=init, seed=seed)
    from .mu import fit_mu

    ref = fit_mu(x, w0, h0, max_iter=max_iter, tol=tol)
    h_ref = np.asarray(ref.h)

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(n_boot, n))
    xb = x[jnp.asarray(idx)]  # (n_boot, N, L)
    w0b, h0b = init_batch(xb, n_components, init=init, seed=seed)
    states = fit_mu_batch(xb, w0b, h0b, max_iter=max_iter, tol=tol)
    hs = np.asarray(states.h)

    sims = np.stack([_match_components(h_ref, hs[b]) for b in range(n_boot)])
    return BootstrapResult(reference_components=h_ref, similarities=sims)


# ---------------------------------------------------------------------------
# masked (weighted) MU and cross-validated rank selection
# ---------------------------------------------------------------------------

def _masked_mu_update(x, mask, w, h):
    """Weighted multiplicative update (Frobenius objective on mask)."""
    mx = mask * x
    ht = h.T
    numerator = mx @ ht
    denominator = (mask * (w @ h)) @ ht
    denominator = jnp.where(denominator == 0, EPSILON, denominator)
    w = w * (numerator / denominator)

    wt = w.T
    numerator = wt @ mx
    denominator = wt @ (mask * (w @ h))
    denominator = jnp.where(denominator == 0, EPSILON, denominator)
    h = h * (numerator / denominator)
    return w, h


def _masked_error(x, mask, w, h):
    diff = mask * (x - w @ h)
    return jnp.sqrt(jnp.sum(diff * diff))


@functools.partial(
    jax.jit, static_argnames=("max_iter", "tol", "check_every")
)
def fit_mu_masked(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    w0: jnp.ndarray,
    h0: jnp.ndarray,
    max_iter: int = 200,
    tol: float = 1e-4,
    check_every: int = 10,
) -> MUState:
    """Masked MU-NMF: minimize ``||mask * (X - WH)||_F`` on device.

    Same loop structure and stopping rule as
    :func:`muscle_synergies_tpu.models.mu.fit_mu`, with every update and
    the convergence error restricted to observed (mask=1) entries.
    """
    error_at_init = _masked_error(x, mask, w0, h0)

    def chunk(state: MUState) -> MUState:
        steps = jnp.minimum(check_every, max_iter - state.n_iter)

        def body(_, wh):
            return _masked_mu_update(x, mask, *wh)

        w, h = jax.lax.fori_loop(0, steps, body, (state.w, state.h))
        n_iter = state.n_iter + steps
        if tol > 0:
            error = _masked_error(x, mask, w, h)
            converged = jnp.logical_and(
                (state.previous_error - error) / error_at_init < tol,
                n_iter % check_every == 0,
            )
            return MUState(w, h, n_iter, error, converged)
        return MUState(w, h, n_iter, state.previous_error, state.converged)

    def cond(state):
        return jnp.logical_and(state.n_iter < max_iter, ~state.converged)

    init = MUState(
        w=jnp.asarray(w0),
        h=jnp.asarray(h0),
        n_iter=jnp.zeros((), jnp.int32),
        previous_error=error_at_init,
        converged=jnp.zeros((), bool),
    )
    return jax.lax.while_loop(cond, chunk, init)


class CVResult(NamedTuple):
    """Cross-validated rank selection outcome.

    ``test_error``: ``(n_repeats, n_ranks)`` relative held-out
    reconstruction errors.  ``best_rank``: the rank minimizing the mean
    held-out error.
    """

    ranks: tuple
    test_error: np.ndarray
    best_rank: int

    @property
    def mean_test_error(self) -> np.ndarray:
        return self.test_error.mean(axis=0)


def cv_rank_selection(
    x,
    ranks: Sequence[int],
    holdout_fraction: float = 0.1,
    n_repeats: int = 5,
    seed: int = 0,
    init: Optional[str] = None,
    max_iter: int = 500,
    tol: float = 1e-6,
) -> CVResult:
    """Wold-style CV: mask random entries, score their reconstruction.

    For every (repeat, rank) pair a masked MU fit runs; all pairs are
    batched into one vmapped solve (ranks zero-padded to the maximum).
    """
    x = jnp.asarray(np.asarray(x, dtype=float))
    n, l = x.shape
    k_max = max(ranks)
    rng = np.random.default_rng(seed)

    masks = (rng.random((n_repeats, n, l)) >= holdout_fraction).astype(x.dtype)

    xs, ms, w0s, h0s = [], [], [], []
    for r in range(n_repeats):
        x_obs = x * masks[r]
        for k in ranks:
            w0, h0 = initialize_nmf(x_obs, k, init=init, seed=seed + r)
            w0p, h0p = _pad_rank(w0, h0, k, k_max)
            xs.append(x)
            ms.append(jnp.asarray(masks[r]))
            w0s.append(w0p)
            h0s.append(h0p)

    fits = jax.vmap(
        lambda xi, mi, wi, hi: fit_mu_masked(
            xi, mi, wi, hi, max_iter=max_iter, tol=tol
        )
    )(jnp.stack(xs), jnp.stack(ms), jnp.stack(w0s), jnp.stack(h0s))

    heldout = []
    x_np = np.asarray(x)
    denom = np.linalg.norm(x_np)
    ws, hs = np.asarray(fits.w), np.asarray(fits.h)
    for i in range(len(xs)):
        r, ki = divmod(i, len(ranks))
        test_mask = 1.0 - masks[r]
        err = test_mask * (x_np - ws[i] @ hs[i])
        heldout.append(np.linalg.norm(err) / denom)
    test_error = np.asarray(heldout).reshape(n_repeats, len(ranks))
    best_rank = int(tuple(ranks)[int(np.argmin(test_error.mean(axis=0)))])
    return CVResult(tuple(ranks), test_error, best_rank)
