"""Fused batched beta-divergence MU iterations as a Pallas TPU kernel.

Same architecture as :mod:`muscle_synergies_tpu.models.kernels.mu_pallas`
(trials on the 128-wide lane dimension, the whole block resident in
VMEM across iterations), specialized for the non-Frobenius objectives
(``beta_loss='kullback-leibler'`` / ``'itakura-saito'``, sklearn
``solver='mu'``):

- unlike the Frobenius updates there is no Gram shortcut — each
  half-iteration reconstructs ``WH`` (k*L lane-parallel FMA chains)
  and forms the quotient ``X / max(WH, EPSILON)``;
- W's denominator is the per-component row-sum of H, H's the
  column-sum of W with sklearn's ``W_sum == 0 -> 1`` guard;
- sklearn's post-update flush ``H[H < float64-eps] = 0`` is applied.

For Itakura-Saito (``beta=0``) the denominator is the ``1/WH``
projection and sklearn's ``gamma = 1/2`` square-root damping and
``beta < 1`` W-flush apply.  Numerics match
:func:`muscle_synergies_tpu.models.beta.mu_update_beta` for both
betas (same clamps, same order).  ~50 KFLOP per trial per
iteration at the benchmark shape — roughly 1.3x the Frobenius
kernel's arithmetic, still VPU-roofline work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..beta import F64_EPS
from ..mu import EPSILON

__all__ = ["beta_mu_iterations_pallas", "kl_mu_iterations_pallas"]


def _num_den_weights(x_m, wh_m, beta: float):
    """Per-channel numerator/denominator weights for the MU update.

    beta=1 (KL): numerator ``X/WH``, denominator constant (factor
    sums, handled by the caller).  beta=0 (IS): numerator ``X/WH^2``,
    denominator ``1/WH``.
    """
    inv = 1.0 / jnp.maximum(wh_m, EPSILON)
    if beta == 1.0:
        return x_m * inv, None
    return x_m * inv * inv, inv


def _beta_step(x, w, h, k: int, l: int, beta: float):
    """One lane-parallel beta-MU update (W then H, sklearn's order)."""
    # ---- W update ----
    num_w, den_w = [], []
    for m in range(l):
        wh = sum(w[j] * h[j, m][None, :] for j in range(k))  # (N, B)
        a, bden = _num_den_weights(x[m], wh, beta)
        num_w.append(a)
        if bden is not None:  # KL has no per-channel denominator weight
            den_w.append(bden)
    w_new = []
    for i in range(k):
        num = sum(num_w[m] * h[i, m][None, :] for m in range(l))  # (N, B)
        if beta == 1.0:
            h_sum = sum(h[i, m] for m in range(l))  # (B,)
            den = jnp.where(h_sum == 0, EPSILON, h_sum)[None, :]
        else:
            den = sum(den_w[m] * h[i, m][None, :] for m in range(l))
            den = jnp.where(den == 0, EPSILON, den)
        delta = num / den
        if beta == 0.0:
            delta = jnp.sqrt(delta)  # sklearn's gamma = 1/(2-beta)
        val = w[i] * delta
        if beta < 1.0:
            val = jnp.where(val < F64_EPS, 0.0, val)
        w_new.append(val)
    w = jnp.stack(w_new)

    # ---- H update with the fresh W ----
    num_w, den_w = [], []
    for m in range(l):
        wh = sum(w[j] * h[j, m][None, :] for j in range(k))
        a, bden = _num_den_weights(x[m], wh, beta)
        num_w.append(a)
        if bden is not None:
            den_w.append(bden)
    h_new = []
    for i in range(k):
        if beta == 1.0:
            w_sum = jnp.sum(w[i], axis=0)  # (B,)
            w_sum = jnp.where(w_sum == 0, 1.0, w_sum)
        rows = []
        for m in range(l):
            num = jnp.sum(w[i] * num_w[m], axis=0)  # (B,)
            if beta == 1.0:
                delta = num / w_sum
            else:
                den = jnp.sum(w[i] * den_w[m], axis=0)
                delta = num / jnp.where(den == 0, EPSILON, den)
                delta = jnp.sqrt(delta)
            val = h[i, m] * delta
            # sklearn's beta<=1 stability flush
            rows.append(jnp.where(val < F64_EPS, 0.0, val))
        h_new.append(jnp.stack(rows))
    return w, jnp.stack(h_new)


def _beta_kernel(x_ref, w_ref, h_ref, w_out, h_out, *, n_iters: int, k: int,
                 l: int, beta: float):
    x = x_ref[:]

    def body(_, carry):
        return _beta_step(x, *carry, k=k, l=l, beta=beta)

    w, h = jax.lax.fori_loop(0, n_iters, body, (w_ref[:], h_ref[:]))
    w_out[:] = w
    h_out[:] = h


@functools.partial(
    jax.jit, static_argnames=("n_iters", "beta", "block_b", "interpret")
)
def beta_mu_iterations_pallas(
    xs: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    n_iters: int,
    beta: float = 1.0,
    block_b: int = 128,
    interpret: bool = False,
):
    """Run ``n_iters`` beta-MU iterations on a ``(B, N, L)`` batch.

    Drop-in for the XLA path
    ``vmap(mu_update_beta(..., beta=beta))`` iterated ``n_iters``
    times, for ``beta`` in {1.0 (KL), 0.0 (Itakura-Saito)}; the batch
    size must divide by ``block_b``.
    """
    if beta not in (0.0, 1.0):
        raise ValueError(
            f"the beta kernel covers beta in {{0, 1}}, got {beta}"
        )
    b, n, l = xs.shape
    k = w.shape[-1]
    if b % block_b != 0:
        raise ValueError(f"batch {b} must be a multiple of block_b={block_b}")

    xt = jnp.transpose(xs, (2, 1, 0))  # (L, N, B)
    wt = jnp.transpose(w, (2, 1, 0))  # (k, N, B)
    ht = jnp.transpose(h, (1, 2, 0))  # (k, L, B)

    kernel = functools.partial(
        _beta_kernel, n_iters=n_iters, k=k, l=l, beta=beta
    )
    wt_out, ht_out = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((l, n, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, l, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, n, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, l, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n, b), w.dtype),
            jax.ShapeDtypeStruct((k, l, b), h.dtype),
        ],
        interpret=interpret,
    )(xt, wt, ht)

    return (
        jnp.transpose(wt_out, (2, 1, 0)),
        jnp.transpose(ht_out, (2, 0, 1)),
    )


def kl_mu_iterations_pallas(
    xs: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    n_iters: int,
    block_b: int = 128,
    interpret: bool = False,
):
    """KL specialization of :func:`beta_mu_iterations_pallas`."""
    return beta_mu_iterations_pallas(
        xs, w, h, n_iters, beta=1.0, block_b=block_b, interpret=interpret
    )
