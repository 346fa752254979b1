#!/usr/bin/env python
"""Secondary benchmark: time-to-90%-VAF on a gait-EMG batch.

BASELINE.md's second metric.  Runs the fused MU iterations in chunks,
checking the batch VAF after each chunk, and reports both the
iteration count and the wall-clock-equivalent time at the measured
per-iteration throughput (direct wall-clock is unreliable through the
remote-device tunnel; see bench.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--samples", type=int, default=200)
    parser.add_argument("--channels", type=int, default=8)
    parser.add_argument("--rank", type=int, default=2)
    parser.add_argument("--vaf", type=float, default=0.90)
    parser.add_argument("--chunk", type=int, default=10)
    parser.add_argument("--max-chunks", type=int, default=200)
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    if args.quick:
        args.batch = 32

    import jax.numpy as jnp

    from muscle_synergies_tpu.models.batch import (
        init_batch,
        mu_iterations_batch,
        vaf_batch,
    )

    rng = np.random.default_rng(0)
    # gait-like: rank-3 nonneg structure + noise, normalized like the
    # tutorial pipeline output
    w_true = rng.random((args.batch, args.samples, 3))
    h_true = rng.random((args.batch, 3, args.channels))
    x = w_true @ h_true + 0.05 * rng.random(
        (args.batch, args.samples, args.channels)
    )
    x = x / x.max(axis=(1, 2), keepdims=True)
    xs = jnp.asarray(x, dtype=jnp.float32)

    w, h = init_batch(xs, args.rank, init="random", seed=1)
    w = w.astype(jnp.float32)
    h = h.astype(jnp.float32)

    iters_done = 0
    reached_at = None
    for _ in range(args.max_chunks):
        w, h = mu_iterations_batch(xs, w, h, args.chunk)
        iters_done += args.chunk
        overall, _ = vaf_batch(xs, w, h)
        frac = float(jnp.mean((overall >= args.vaf).astype(jnp.float32)))
        if frac >= 1.0:
            reached_at = iters_done
            break

    if reached_at is None:
        print(json.dumps({
            "metric": "iterations_to_vaf",
            "value": -1,
            "unit": f"not reached in {iters_done} iters",
            "vs_baseline": 0,
        }))
        return 1

    # translate to seconds at the measured kernel throughput
    from muscle_synergies_tpu.models.kernels import mu_iterations_pallas

    block_b = min(128, args.batch)
    w0, h0 = init_batch(xs, args.rank, init="random", seed=2)
    w0, h0 = w0.astype(jnp.float32), h0.astype(jnp.float32)
    mu_iterations_pallas(xs, w0, h0, 100, block_b=block_b)  # warm
    t1 = time.perf_counter()
    wa, ha = mu_iterations_pallas(xs, w0, h0, 100, block_b=block_b)
    float(jnp.sum(wa))
    t1 = time.perf_counter() - t1
    t2 = time.perf_counter()
    wb, hb = mu_iterations_pallas(xs, w0, h0, 1100, block_b=block_b)
    float(jnp.sum(wb))
    t2 = time.perf_counter() - t2
    per_iter = max((t2 - t1) / 1000.0, 1e-9)

    seconds = reached_at * per_iter
    print(json.dumps({
        "metric": f"time_to_{int(args.vaf * 100)}pct_vaf",
        "value": round(seconds * 1e3, 3),
        "unit": f"ms ({reached_at} MU iters, batch={args.batch}, "
                f"rank={args.rank})",
        "vs_baseline": round(reached_at * 1.0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
