"""Fused batched convolutive-NMF iterations as a Pallas TPU kernel.

Same architecture as :mod:`.mu_pallas`, extended with the lag
dimension: a block of trials rides the 128-wide lane dimension and
stays *resident in VMEM* across all iterations, so the XLA path's
per-iteration HBM re-reads of X disappear.  Per-trial contractions are
tiny (k=4, D~10, L=8 — a (200x8) x (8x40) matmul fills a fraction of
an MXU tile), so the kernel unrolls them as lane-parallel VPU
fused-multiply-adds, exactly like the plain-MU kernel.

Layouts: ``X (L, N, B)``, ``C (K, N, B)``, ``S (K, D, L, B)``.  The
causal shifts ``C[t-d]`` are static sublane concat-slices (zeros in,
tail off), mirroring
:func:`muscle_synergies_tpu.models.cnmf._shift_down` bit-for-bit; the
C update's look-ahead sums accumulate in place so only ``O(K)``
``(N, B)`` temporaries are live (the naive form keeps ``K*D`` of them
and overflows scoped VMEM at block 128).

FLOP audit (k=4, D=10, L=8, N=200): two reconstructions, the
S-update's paired projections, and the C-update's paired lag sums are
each ``K·D·L·N`` lane FMAs — six passes ≈ **770 KFLOP per trial per
iteration** (~10x the plain-MU iteration, as expected: every
projection is a D-deep stack).  See the README roofline table for the
measured rate against the f32 VPU peak.

Numerics match :func:`muscle_synergies_tpu.models.cnmf.cnmf_update`
(same update order, same sklearn float32-eps guard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mu import EPSILON

__all__ = ["cnmf_iterations_pallas"]


def _shift_down_lane(arr, d: int):
    """``out[t] = arr[t-d]`` on a ``(N, B)`` block, zeros for ``t < d``."""
    if d == 0:
        return arr
    zeros = jnp.zeros((d, arr.shape[1]), arr.dtype)
    return jnp.concatenate([zeros, arr[: arr.shape[0] - d]], axis=0)


def _shift_up_lane(arr, d: int):
    """``out[t] = arr[t+d]`` on a ``(N, B)`` block, zeros at the tail."""
    if d == 0:
        return arr
    zeros = jnp.zeros((d, arr.shape[1]), arr.dtype)
    return jnp.concatenate([arr[d:], zeros], axis=0)


def _cnmf_step(x, c, s, k: int, d_lags: int, l: int):
    """One lane-parallel convolutive update (S then C, model order).

    ``x (L, N, B)``, ``c (K, N, B)``, ``s (K, D, L, B)`` jnp arrays.
    """
    cs = [
        [_shift_down_lane(c[ki], d) for d in range(d_lags)]
        for ki in range(k)
    ]

    def reconstruct(sv):
        # sv[ki][d][li] -> (B,); one (N, B) accumulation per channel
        return [
            sum(
                cs[ki][d] * sv[ki][d][li][None, :]
                for ki in range(k)
                for d in range(d_lags)
            )
            for li in range(l)
        ]

    s_list = [
        [[s[ki, d, li] for li in range(l)] for d in range(d_lags)]
        for ki in range(k)
    ]

    # ---- S update: per-(k, d, l) time-reduced projections ----
    xhat = reconstruct(s_list)
    s_new = [
        [[None] * l for _ in range(d_lags)] for _ in range(k)
    ]
    for ki in range(k):
        for d in range(d_lags):
            for li in range(l):
                num = jnp.sum(cs[ki][d] * x[li], axis=0)  # (B,)
                den = jnp.sum(cs[ki][d] * xhat[li], axis=0)
                den = jnp.where(den == 0, EPSILON, den)
                s_new[ki][d][li] = s_list[ki][d][li] * (num / den)

    # ---- C update: ratio of lag-shifted sums, with the fresh S ----
    xhat = reconstruct(s_new)
    num_c = [None] * k
    den_c = [None] * k
    for d in range(d_lags):
        for ki in range(k):
            g_num = sum(
                x[li] * s_new[ki][d][li][None, :] for li in range(l)
            )
            g_den = sum(
                xhat[li] * s_new[ki][d][li][None, :] for li in range(l)
            )
            up_n = _shift_up_lane(g_num, d)
            up_d = _shift_up_lane(g_den, d)
            num_c[ki] = up_n if num_c[ki] is None else num_c[ki] + up_n
            den_c[ki] = up_d if den_c[ki] is None else den_c[ki] + up_d
    c_new = jnp.stack([
        c[ki]
        * (num_c[ki] / jnp.where(den_c[ki] == 0, EPSILON, den_c[ki]))
        for ki in range(k)
    ])
    s_stacked = jnp.stack([
        jnp.stack([jnp.stack(s_new[ki][d]) for d in range(d_lags)])
        for ki in range(k)
    ])
    return c_new, s_stacked


def _cnmf_kernel(
    x_ref, c_ref, s_ref, c_out, s_out,
    *, n_iters: int, k: int, d_lags: int, l: int,
):
    x = x_ref[:]  # (L, N, Bblk)

    def body(_, carry):
        c, s = carry
        return _cnmf_step(x, c, s, k=k, d_lags=d_lags, l=l)

    c_fin, s_fin = jax.lax.fori_loop(
        0, n_iters, body, (c_ref[:], s_ref[:])
    )
    c_out[:] = c_fin
    s_out[:] = s_fin


@functools.partial(
    jax.jit, static_argnames=("n_iters", "block_b", "interpret")
)
def cnmf_iterations_pallas(
    xs: jnp.ndarray,
    c: jnp.ndarray,
    s: jnp.ndarray,
    n_iters: int,
    block_b: int = 128,
    interpret: bool = False,
):
    """Run ``n_iters`` convolutive updates on a ``(B, T, L)`` batch.

    Drop-in for the XLA path of
    :func:`muscle_synergies_tpu.models.cnmf.cnmf_iterations_batch`;
    the batch must divide by ``block_b``.  ``block_b=128`` is the only
    workable tile on current Mosaic: smaller blocks violate the
    128-lane divisibility rule (unless the block spans the whole
    batch) and 256 overflows scoped VMEM at D~10 (both measured;
    sustained ~5.8k conv-iter/s at 1024x200x8, k=4, D=10 — ~4.6
    TFLOP/s of lane FMAs, at the f32 VPU roofline).
    """
    b, n, l = xs.shape
    k = c.shape[-1]
    d_lags = s.shape[2]
    if b % block_b != 0:
        raise ValueError(f"batch {b} must be a multiple of block_b={block_b}")

    xt = jnp.transpose(xs, (2, 1, 0))  # (L, N, B)
    ct = jnp.transpose(c, (2, 1, 0))  # (K, N, B)
    st = jnp.transpose(s, (1, 2, 3, 0))  # (K, D, L, B)

    grid = (b // block_b,)
    kernel = functools.partial(
        _cnmf_kernel, n_iters=n_iters, k=k, d_lags=d_lags, l=l
    )
    ct_out, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((l, n, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d_lags, l, block_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, n, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d_lags, l, block_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n, b), c.dtype),
            jax.ShapeDtypeStruct((k, d_lags, l, b), s.dtype),
        ],
        interpret=interpret,
    )(xt, ct, st)

    c_out = jnp.transpose(ct_out, (2, 1, 0))
    s_out = jnp.transpose(st_out, (3, 0, 1, 2))
    return c_out, s_out
