#!/usr/bin/env python
"""Headline benchmark: MU-NMF iterations/sec/chip on a 1024-trial batch.

Measures the throughput of the fused batched multiplicative-update
iteration (rank-4 synergies from 8-channel gait EMG, 200 time-normalized
samples per trial — the BASELINE.json configuration) on the default JAX
device.  Target from BASELINE.md: >= 10,000 MU iterations/sec/chip.

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--samples", type=int, default=200)
    parser.add_argument("--channels", type=int, default=8)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--iters", type=int, default=1000,
                        help="MU iterations per timed run")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--quick", action="store_true",
                        help="tiny smoke-test configuration")
    parser.add_argument("--dtype", default="float32")
    parser.add_argument(
        "--impl", choices=["auto", "pallas", "xla"], default="auto",
        help="auto = fused Pallas kernel on TPU, XLA batched updates "
             "elsewhere",
    )
    args = parser.parse_args()

    if args.quick:
        # keep 3 repeats: with tiny per-call compute the chain
        # differencing needs a median to survive relay jitter
        args.batch, args.iters, args.repeats = 32, 50, 3

    import jax
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.batch import mu_iterations_batch

    impl = args.impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from muscle_synergies_tpu.models.kernels import mu_iterations_pallas

        block_b = min(128, args.batch)

        def step_fn(xs, w, h, iters):
            return mu_iterations_pallas(xs, w, h, iters, block_b=block_b)
    else:
        step_fn = mu_iterations_batch

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    # synthetic gait-like envelopes: nonneg low-rank + noise
    w_true = rng.random((args.batch, args.samples, 3))
    h_true = rng.random((args.batch, 3, args.channels))
    x_np = (w_true @ h_true + 0.05 * rng.random(
        (args.batch, args.samples, args.channels))).astype(dtype)

    xs = jnp.asarray(x_np)
    avg = float(np.sqrt(x_np.mean() / args.rank))

    def fresh_factors(seed):
        r = np.random.default_rng(seed)
        w0 = jnp.asarray(avg * np.abs(r.standard_normal(
            (args.batch, args.samples, args.rank))).astype(dtype))
        h0 = jnp.asarray(avg * np.abs(r.standard_normal(
            (args.batch, args.rank, args.channels))).astype(dtype))
        return w0, h0

    def timed_chain(n_calls, seed):
        """Chain dependent solver calls; end with a scalar readback.

        Chaining defeats any transparent result caching between
        identical calls, and the scalar readback forces execution to
        complete even through remote-device tunnels where
        ``block_until_ready`` can return optimistically.
        """
        w, h = fresh_factors(seed)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            w, h = step_fn(xs, w, h, args.iters)
        float(jnp.sum(w) + jnp.sum(h))
        return time.perf_counter() - t0

    # warm-up: compile
    timed_chain(1, seed=999)

    # Difference two chain lengths to cancel fixed dispatch/transfer
    # latency (the remote tunnel adds O(100ms) of jittery overhead per
    # measurement), sizing the longer chain so its compute dwarfs that
    # noise (~2 s of kernel time).
    def diff_measure(k1, k2, seed):
        t1 = timed_chain(k1, seed=seed)
        t2 = timed_chain(k2, seed=seed + 1)
        return (t2 - t1) / (k2 - k1)

    est = diff_measure(2, 12, seed=5000)
    if not np.isfinite(est) or est <= 0:
        est = 5e-3
    k2 = 2 + int(np.clip(round(2.0 / est), 10, 2000))
    samples = [
        diff_measure(2, k2, seed=1000 + 10 * rep)
        for rep in range(args.repeats)
    ]
    per_call = float(np.median(samples))
    if not np.isfinite(per_call) or per_call <= 0:
        # jitter swamped the differencing; fall back to the long-chain
        # average, a strict upper bound on the per-call time (so the
        # reported throughput is an underestimate, never nonsense)
        per_call = timed_chain(k2, seed=4242) / k2

    iters_per_sec = args.iters / per_call
    print(json.dumps({
        "metric": "mu_nmf_iterations_per_sec_per_chip",
        "value": round(iters_per_sec, 2),
        "unit": f"iter/s (batch={args.batch}x{args.samples}x"
                f"{args.channels}, k={args.rank}, {dtype.name}, {impl})",
        "vs_baseline": round(iters_per_sec / 10_000.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
