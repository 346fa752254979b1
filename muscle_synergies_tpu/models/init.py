"""NMF factor initialization (NNDSVD family + random), sklearn-matching.

Reproduces the semantics of ``sklearn.decomposition._nmf._initialize_nmf``
so solver trajectories are comparable: NNDSVD splits each singular
triplet into its positive/negative parts and keeps the dominant one;
``nndsvda`` fills zeros with ``X.mean()``; ``nndsvdar`` with small
random values; ``random`` draws ``|N(0,1)| * sqrt(X.mean()/k)``.

Everything is expressed in jnp so a batch of trials initializes in one
vmapped computation on device (the reference delegates to sklearn's
host-side randomized SVD; here an exact SVD is used, which for the
k << min(N, L) regime of synergy analysis agrees up to sign flips —
handled with the same sign convention as ``sklearn.utils.svd_flip``).

For iterate-level trajectory parity against sklearn's *default* init,
``svd_method="randomized"`` switches to the host-side bit-exact
replica in :mod:`muscle_synergies_tpu.models.rsvd` (same RandomState
stream, LU-normalized power iterations, gesdd, svd_flip).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .rsvd import initialize_nmf_sklearn

__all__ = ["initialize_nmf", "nndsvd"]


def _svd_flip(u: jnp.ndarray, v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic SVD sign convention (largest |u| entry positive)."""
    max_abs_rows = jnp.argmax(jnp.abs(u), axis=0)
    signs = jnp.sign(u[max_abs_rows, jnp.arange(u.shape[1])])
    signs = jnp.where(signs == 0, 1.0, signs)
    return u * signs, v * signs[:, None]


def nndsvd(
    x: jnp.ndarray,
    n_components: int,
    variant: str = "nndsvd",
    eps: float = 1e-6,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nonnegative Double SVD initialization of ``x ~ W @ H``.

    Args:
        x: ``(N, L)`` non-negative matrix.
        n_components: rank ``k`` (must satisfy ``k <= min(N, L)``).
        variant: ``"nndsvd"``, ``"nndsvda"`` or ``"nndsvdar"``.
        eps: entries below this are truncated to zero before filling.
        seed: PRNG seed for the ``nndsvdar`` fill.

    Returns:
        ``(W, H)`` with shapes ``(N, k)`` and ``(k, L)``.
    """
    u, s, vt = jnp.linalg.svd(x, full_matrices=False)
    u, vt = _svd_flip(u[:, :n_components], vt[:n_components])
    s = s[:n_components]

    cols_w = [jnp.sqrt(s[0]) * jnp.abs(u[:, 0])]
    rows_h = [jnp.sqrt(s[0]) * jnp.abs(vt[0])]
    for j in range(1, n_components):
        xj, yj = u[:, j], vt[j]
        x_p, y_p = jnp.maximum(xj, 0), jnp.maximum(yj, 0)
        x_n, y_n = jnp.abs(jnp.minimum(xj, 0)), jnp.abs(jnp.minimum(yj, 0))
        x_p_nrm, y_p_nrm = jnp.linalg.norm(x_p), jnp.linalg.norm(y_p)
        x_n_nrm, y_n_nrm = jnp.linalg.norm(x_n), jnp.linalg.norm(y_n)
        m_p, m_n = x_p_nrm * y_p_nrm, x_n_nrm * y_n_nrm

        take_p = m_p > m_n
        safe = lambda a, b: a / jnp.where(b == 0, 1.0, b)  # noqa: E731
        uu = jnp.where(take_p, safe(x_p, x_p_nrm), safe(x_n, x_n_nrm))
        vv = jnp.where(take_p, safe(y_p, y_p_nrm), safe(y_n, y_n_nrm))
        sigma = jnp.where(take_p, m_p, m_n)
        lbd = jnp.sqrt(s[j] * sigma)
        cols_w.append(lbd * uu)
        rows_h.append(lbd * vv)

    w = jnp.stack(cols_w, axis=1)
    h = jnp.stack(rows_h, axis=0)
    w = jnp.where(w < eps, 0.0, w)
    h = jnp.where(h < eps, 0.0, h)

    if variant == "nndsvd":
        return w, h
    avg = jnp.mean(x)
    if variant == "nndsvda":
        w = jnp.where(w == 0, avg, w)
        h = jnp.where(h == 0, avg, h)
        return w, h
    if variant == "nndsvdar":
        key_w, key_h = jax.random.split(jax.random.PRNGKey(seed))
        rw = jnp.abs(avg * jax.random.normal(key_w, w.shape, w.dtype) / 100)
        rh = jnp.abs(avg * jax.random.normal(key_h, h.shape, h.dtype) / 100)
        return jnp.where(w == 0, rw, w), jnp.where(h == 0, rh, h)
    raise ValueError(f"unknown nndsvd variant: {variant}")


def initialize_nmf(
    x: jnp.ndarray,
    n_components: int,
    init: Optional[str] = None,
    eps: float = 1e-6,
    seed: int = 0,
    svd_method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Initial ``(W, H)`` for NMF, following sklearn's dispatch rules.

    ``init=None`` resolves to ``"nndsvda"`` when
    ``k <= min(N, L)`` and ``"random"`` otherwise.

    ``svd_method="exact"`` (default) runs the jnp/device path;
    ``"randomized"`` runs the host-side sklearn bit-replica (randomized
    SVD seeded by ``np.random.RandomState(seed)``) so factors — and
    hence solver trajectories — match ``sklearn.decomposition.NMF``
    with ``random_state=seed`` exactly.
    """
    if svd_method == "randomized":
        x_np = np.asarray(x)
        w, h = initialize_nmf_sklearn(
            x_np, n_components, init=init, eps=eps, random_state=seed
        )
        return jnp.asarray(w, dtype=x_np.dtype), jnp.asarray(h, dtype=x_np.dtype)
    if svd_method != "exact":
        raise ValueError(
            f"svd_method must be 'exact' or 'randomized', got {svd_method!r}"
        )
    x = jnp.asarray(x)
    n, l = x.shape
    if init is not None and init != "random" and n_components > min(n, l):
        raise ValueError(
            f"init = '{init}' can only be used when "
            "n_components <= min(n_samples, n_features)"
        )
    if init is None:
        init = "nndsvda" if n_components <= min(n, l) else "random"

    if init == "random":
        avg = jnp.sqrt(jnp.mean(x) / n_components)
        key_h, key_w = jax.random.split(jax.random.PRNGKey(seed))
        h = jnp.abs(avg * jax.random.normal(key_h, (n_components, l), x.dtype))
        w = jnp.abs(avg * jax.random.normal(key_w, (n, n_components), x.dtype))
        return w, h
    if init in {"nndsvd", "nndsvda", "nndsvdar"}:
        return nndsvd(x, n_components, variant=init, eps=eps, seed=seed)
    raise ValueError(
        f"Invalid init parameter: got {init!r} instead of one of "
        "(None, 'random', 'nndsvd', 'nndsvda', 'nndsvdar')"
    )
