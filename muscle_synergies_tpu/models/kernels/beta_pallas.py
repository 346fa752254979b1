"""Fused batched Kullback-Leibler MU iterations as a Pallas TPU kernel.

Same architecture as :mod:`muscle_synergies_tpu.models.kernels.mu_pallas`
(trials on the 128-wide lane dimension, the whole block resident in
VMEM across iterations), specialized for the generalized-KL objective
(``beta_loss='kullback-leibler'``, sklearn ``solver='mu'``):

- unlike the Frobenius updates there is no Gram shortcut — each
  half-iteration reconstructs ``WH`` (k*L lane-parallel FMA chains)
  and forms the quotient ``X / max(WH, EPSILON)``;
- W's denominator is the per-component row-sum of H, H's the
  column-sum of W with sklearn's ``W_sum == 0 -> 1`` guard;
- sklearn's post-update flush ``H[H < float64-eps] = 0`` is applied.

Numerics match :func:`muscle_synergies_tpu.models.beta.mu_update_beta`
with ``beta=1`` (same clamps, same order).  ~50 KFLOP per trial per
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

__all__ = ["kl_mu_iterations_pallas"]


def _kl_step(x, w, h, k: int, l: int):
    """One lane-parallel KL-MU update (W then H, sklearn's order)."""
    # ---- W update: quot = X / max(WH, eps), den = row-sums of H ----
    quot = []
    for m in range(l):
        wh = sum(w[j] * h[j, m][None, :] for j in range(k))  # (N, B)
        quot.append(x[m] / jnp.maximum(wh, EPSILON))
    h_sum = [sum(h[i, m] for m in range(l)) for i in range(k)]  # (B,)
    w_new = []
    for i in range(k):
        num = sum(quot[m] * h[i, m][None, :] for m in range(l))  # (N, B)
        den = jnp.where(h_sum[i] == 0, EPSILON, h_sum[i])
        w_new.append(w[i] * (num / den[None, :]))
    w = jnp.stack(w_new)

    # ---- H update with the fresh W ----
    for m in range(l):
        wh = sum(w[j] * h[j, m][None, :] for j in range(k))
        quot[m] = x[m] / jnp.maximum(wh, EPSILON)
    h_new = []
    for i in range(k):
        w_sum = jnp.sum(w[i], axis=0)  # (B,)
        w_sum = jnp.where(w_sum == 0, 1.0, w_sum)
        rows = []
        for m in range(l):
            num = jnp.sum(w[i] * quot[m], axis=0)  # (B,)
            val = h[i, m] * (num / w_sum)
            # sklearn's beta<=1 stability flush
            rows.append(jnp.where(val < F64_EPS, 0.0, val))
        h_new.append(jnp.stack(rows))
    return w, jnp.stack(h_new)


def _kl_kernel(x_ref, w_ref, h_ref, w_out, h_out, *, n_iters: int, k: int,
               l: int):
    x = x_ref[:]

    def body(_, carry):
        return _kl_step(x, *carry, k=k, l=l)

    w, h = jax.lax.fori_loop(0, n_iters, body, (w_ref[:], h_ref[:]))
    w_out[:] = w
    h_out[:] = h


@functools.partial(
    jax.jit, static_argnames=("n_iters", "block_b", "interpret")
)
def kl_mu_iterations_pallas(
    xs: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    n_iters: int,
    block_b: int = 128,
    interpret: bool = False,
):
    """Run ``n_iters`` KL-MU iterations on a ``(B, N, L)`` batch.

    Drop-in for the XLA path
    ``vmap(mu_update_beta(..., beta=1))`` iterated ``n_iters`` times;
    the batch size must divide by ``block_b``.
    """
    b, n, l = xs.shape
    k = w.shape[-1]
    if b % block_b != 0:
        raise ValueError(f"batch {b} must be a multiple of block_b={block_b}")

    xt = jnp.transpose(xs, (2, 1, 0))  # (L, N, B)
    wt = jnp.transpose(w, (2, 1, 0))  # (k, N, B)
    ht = jnp.transpose(h, (1, 2, 0))  # (k, L, B)

    kernel = functools.partial(_kl_kernel, n_iters=n_iters, k=k, l=l)
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
