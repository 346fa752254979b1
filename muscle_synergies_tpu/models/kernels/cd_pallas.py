"""Fused batched HALS/coordinate-descent iterations as a Pallas kernel.

Companion to :mod:`mu_pallas` for the 'cd' solver (the sklearn default
the reference relies on).  Same design: trials ride the lane
dimension, the trial block stays resident in VMEM across all
iterations, and the small component loop unrolls.

One outer iteration = one cyclic coordinate pass over W's components
(H fixed) followed by one over H's (W fixed), exactly the update order
of :func:`muscle_synergies_tpu.models.hals.cd_pass` with
``shuffle=False`` — so the kernel's iterates match the XLA solver's up
to float reordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cd_iterations_pallas"]


def _cd_kernel(x_ref, w_ref, h_ref, w_out, h_out, *, n_iters: int, k: int, l: int):
    x = x_ref[:]  # (L, N, B)

    def body(_, carry):
        w, h = carry  # (k, N, B), (k, L, B)

        # ---- W pass: cyclic over components, H fixed ----
        # symmetric Gram: the lower triangle is bitwise the upper one
        hht = [[None] * k for _ in range(k)]
        for i in range(k):
            for j in range(i, k):
                hht[i][j] = hht[j][i] = sum(
                    h[i, m] * h[j, m] for m in range(l)
                )  # (B,)
        xht = [
            sum(h[s, m][None, :] * x[m] for m in range(l)) for s in range(k)
        ]  # k x (N, B)
        w_cols = [w[s] for s in range(k)]
        for s in range(k):
            grad = sum(hht[j][s][None, :] * w_cols[j] for j in range(k))
            grad = grad - xht[s]
            hess = hht[s][s]
            safe = jnp.where(hess == 0, 1.0, hess)
            new_col = jnp.maximum(w_cols[s] - grad / safe[None, :], 0.0)
            w_cols[s] = jnp.where(hess[None, :] != 0, new_col, w_cols[s])
        w = jnp.stack(w_cols)

        # ---- H pass: cyclic over components, W fixed ----
        wtw = [[None] * k for _ in range(k)]
        for i in range(k):
            for j in range(i, k):
                wtw[i][j] = wtw[j][i] = jnp.sum(w[i] * w[j], axis=0)  # (B,)
        wtx = [
            jnp.stack([jnp.sum(w[s] * x[m], axis=0) for m in range(l)])
            for s in range(k)
        ]  # k x (L, B)
        h_rows = [h[s] for s in range(k)]
        for s in range(k):
            grad = sum(wtw[j][s][None, :] * h_rows[j] for j in range(k))
            grad = grad - wtx[s]
            hess = wtw[s][s]
            safe = jnp.where(hess == 0, 1.0, hess)
            new_row = jnp.maximum(h_rows[s] - grad / safe[None, :], 0.0)
            h_rows[s] = jnp.where(hess[None, :] != 0, new_row, h_rows[s])
        h = jnp.stack(h_rows)
        return w, h

    w, h = jax.lax.fori_loop(0, n_iters, body, (w_ref[:], h_ref[:]))
    w_out[:] = w
    h_out[:] = h


@functools.partial(jax.jit, static_argnames=("n_iters", "block_b", "interpret"))
def cd_iterations_pallas(
    xs: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    n_iters: int,
    block_b: int = 128,
    interpret: bool = False,
):
    """Run ``n_iters`` HALS/CD outer iterations on a ``(B, N, L)`` batch.

    Matches ``fit_cd``'s update order (without the violation-based
    stopping — this is the fixed-iteration throughput path).
    """
    b, n, l = xs.shape
    k = w.shape[-1]
    if b % block_b != 0:
        raise ValueError(f"batch {b} must be a multiple of block_b={block_b}")

    xt = jnp.transpose(xs, (2, 1, 0))  # (L, N, B)
    wt = jnp.transpose(w, (2, 1, 0))  # (k, N, B)
    ht = jnp.transpose(h, (1, 2, 0))  # (k, L, B)

    kernel = functools.partial(_cd_kernel, n_iters=n_iters, k=k, l=l)
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
