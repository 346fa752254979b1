#!/usr/bin/env python
"""Headline benchmark: NMF iterations/sec/chip on a 1024-trial batch.

Default mode measures the throughput of the fused batched
multiplicative-update iteration (rank-4 synergies from 8-channel gait
EMG, 200 time-normalized samples per trial — the BASELINE.json
configuration) on the default JAX device.  Target from BASELINE.md:
>= 10,000 MU iterations/sec/chip.

``--solver {mu,cd,kl,is,cnmf,nm3f}`` selects the iteration being
measured (and checked): Frobenius multiplicative updates (the
headline), HALS coordinate descent (the TPU twin of sklearn's default
``solver='cd'`` behind the reference's ``find_synergies`` — reference
analysis.py:862), KL-loss MU (``beta_loss='kullback-leibler'``),
Itakura-Saito MU (``beta_loss='itakura-saito'``), the convolutive
(time-varying) updates, and the space-by-time trilinear (NM3F)
updates.  Every README throughput row is reproducible from this one
harness.

``--metric vaf`` measures BASELINE.md's second metric — time to 90%
batch VAF on the *calibrated gait regime* (32 distinct seeded
``synthesize_gait_emg`` captures through the tutorial pipeline, tiled
to the batch; the 0.9567-at-rank-2 anchor regime) — as one on-device
convergence loop (iteration count) priced at the measured
per-iteration throughput, with ``vs_baseline`` the speedup over
sklearn's NMF doing the same job trial-by-trial on the host CPU (the
reference's execution model, analysis.py:909-913).

``--check`` validates device numerics instead of speed: it runs every
Pallas kernel (MU, CD, KL, IS iterations, fused filtfilt) against
float64 host references on the *active* platform and asserts the
documented f32 tolerances — on a real TPU this closes the gap that
interpret-mode CPU tests cannot (BASELINE.md 1e-6 parity north star).

Every mode prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
(``--check``/``--metric vaf`` artifacts add a ``"date"`` stamp so
tee'd JSON files record when they were produced.)
"""

import argparse
import datetime
import json
import sys
import time

import numpy as np

# sklearn's EPSILON (float32 eps), the MU zero-denominator guard
EPSILON = 1.1920929e-07


def _parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--samples", type=int, default=200)
    parser.add_argument("--channels", type=int, default=8)
    parser.add_argument("--rank", type=int, default=4)
    parser.add_argument("--iters", type=int, default=1000,
                        help="solver iterations per timed run")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--quick", action="store_true",
                        help="tiny smoke-test configuration")
    parser.add_argument("--dtype", default="float32")
    parser.add_argument(
        "--impl", choices=["auto", "pallas", "xla"], default="auto",
        help="auto = fused Pallas kernel on TPU, XLA batched updates "
             "elsewhere",
    )
    parser.add_argument(
        "--solver", choices=["mu", "cd", "kl", "is", "cnmf", "nm3f"],
        default="mu",
        help="which solver iteration to measure/check: mu = Frobenius "
             "multiplicative updates (headline), cd = HALS coordinate "
             "descent (sklearn's default solver), kl / is = "
             "beta-divergence MU (beta=1 / beta=0), cnmf = the "
             "convolutive (time-varying synergy) updates, nm3f = the "
             "space-by-time trilinear updates (--rank temporal modules "
             "x --spatial spatial modules, shared across the batch)",
    )
    parser.add_argument(
        "--metric", choices=["iters", "vaf", "fit"], default="iters",
        help="iters = solver iterations/sec/chip (headline); vaf = "
             "time-to-90%%-VAF (BASELINE.md's second metric); fit = "
             "full convergence-fit wall time for the batch, fused "
             "pallas vs batched XLA",
    )
    parser.add_argument("--vaf-target", type=float, default=0.90)
    parser.add_argument("--lags", type=int, default=10,
                        help="temporal extent of each synergy "
                             "(--solver cnmf only)")
    parser.add_argument("--spatial", type=int, default=3,
                        help="spatial module count Q of the space-by-"
                             "time model (--solver nm3f only; --rank "
                             "is the temporal module count P)")
    parser.add_argument(
        "--check", action="store_true",
        help="validate Pallas kernel numerics on the active device "
             "against float64 host references instead of timing",
    )
    return parser.parse_args(argv)


def _utc_date() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _resolve_impl(impl, solver="mu"):
    import jax

    if solver == "nm3f":
        # no Pallas twin: the trilinear updates are batched einsums
        # that map straight onto the MXU through XLA (an explicit
        # --impl pallas is rejected up front in main())
        return "xla"
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def _nm3f_avg(x_np, n_temporal, n_spatial):
    """Init magnitude: trilinear ``E[X̂] ≈ P·Q·c³ = mean(X)``."""
    return float(
        (x_np.mean() / (n_temporal * n_spatial)) ** (1.0 / 3.0)
    )


def _make_step(impl, batch, solver="mu"):
    """Return ``step(xs, w, h, iters)`` for the chosen solver/impl."""
    from muscle_synergies_tpu.models.batch import (
        beta_mu_iterations_batch,
        cd_iterations_batch,
        mu_iterations_batch,
    )

    block_b = min(128, batch)

    if solver == "nm3f":
        import jax

        from muscle_synergies_tpu.models.nm3f import nm3f_update

        # factor slots: w = shared temporal modules W (T, P); the
        # second slot carries the (A, S) pair as a pytree — per-trial
        # coefficients (B, P, Q) and shared spatial modules (Q, L)
        def step_fn(xs, w, a_s, iters):
            a, s = a_s

            def one(_, was):
                return nm3f_update(xs, *was)

            w, a, s = jax.lax.fori_loop(0, iters, one, (w, a, s))
            return w, (a, s)
    elif solver == "cnmf":
        from muscle_synergies_tpu.models.cnmf import cnmf_iterations_batch

        def step_fn(xs, c, srg, iters):
            # block_b=None: cnmf_iterations_batch picks the legal tile
            return cnmf_iterations_batch(xs, c, srg, iters, impl=impl)
    elif solver == "mu":
        def step_fn(xs, w, h, iters):
            return mu_iterations_batch(
                xs, w, h, iters, impl=impl, block_b=block_b
            )
    elif solver == "cd":
        def step_fn(xs, w, h, iters):
            return cd_iterations_batch(
                xs, w, h, iters, impl=impl, block_b=block_b
            )
    else:
        beta = 1.0 if solver == "kl" else 0.0

        def step_fn(xs, w, h, iters):
            return beta_mu_iterations_batch(
                xs, w, h, iters, beta=beta, impl=impl, block_b=block_b
            )
    return step_fn


def _make_problem(args, dtype, solver="mu"):
    """Synthetic gait-like envelopes: nonneg low-rank + noise.

    The Itakura-Saito objective has poles at zero, so its problem is
    shifted strictly positive (sklearn raises on zeros for beta <= 0).
    """
    rng = np.random.default_rng(0)
    w_true = rng.random((args.batch, args.samples, 3))
    h_true = rng.random((args.batch, 3, args.channels))
    x_np = (w_true @ h_true + 0.05 * rng.random(
        (args.batch, args.samples, args.channels))).astype(dtype)
    if solver == "is":
        x_np = x_np + np.asarray(0.05, dtype)
    return x_np


def _make_gait_problem(args, dtype, solver="mu", n_distinct=32):
    """The calibrated gait regime for the time-to-VAF metric.

    Each distinct trial is a different seeded
    ``testing.synthesize_gait_emg`` capture run through the tutorial
    pipeline (zero-center -> 0.5 s RMS -> time-normalize ->
    amplitude-normalize), the regime the repo's VAF anchor pins to the
    reference notebook's 0.9567-at-rank-2 (tests/test_vaf_anchor.py).
    Convergence to 90% VAF here takes a realistic iteration count —
    unlike the synthetic low-rank batch, which solves in ~10
    iterations and made the old artifact trivial (VERDICT r3 weak #3).
    Tiling the distinct problems to ``args.batch`` fills the lanes
    without changing per-trial convergence behavior.
    """
    from muscle_synergies_tpu.dataset import preprocess_trials
    from muscle_synergies_tpu.testing import synthesize_gait_emg
    from muscle_synergies_tpu.utils.config import PipelineConfig

    n_distinct = min(n_distinct, args.batch)
    trials = [synthesize_gait_emg(seed=100 + i) for i in range(n_distinct)]
    cfg = PipelineConfig(
        use_rms=True,
        rms_window_s=0.5,
        reduce_to=args.samples,
        amplitude_normalize=True,
        zero_center=True,
    )
    batch = np.asarray(preprocess_trials(trials, 2000.0, cfg, dtype=dtype))
    if solver == "is":
        batch = batch + np.asarray(0.05, dtype)
    reps = -(-args.batch // n_distinct)
    return np.tile(batch, (reps, 1, 1))[: args.batch]


def _fresh_factors(args, dtype, seed, avg):
    import jax.numpy as jnp

    r = np.random.default_rng(seed)
    if getattr(args, "solver", "mu") == "nm3f":
        wt = jnp.asarray(avg * np.abs(r.standard_normal(
            (args.samples, args.rank))).astype(dtype))
        a0 = jnp.asarray(avg * np.abs(r.standard_normal(
            (args.batch, args.rank, args.spatial))).astype(dtype))
        s0 = jnp.asarray(avg * np.abs(r.standard_normal(
            (args.spatial, args.channels))).astype(dtype))
        return wt, (a0, s0)  # shared W, (per-trial A, shared S)
    w0 = jnp.asarray(avg * np.abs(r.standard_normal(
        (args.batch, args.samples, args.rank))).astype(dtype))
    if getattr(args, "solver", "mu") == "cnmf":
        s0 = jnp.asarray(avg * np.abs(r.standard_normal(
            (args.batch, args.rank, args.lags, args.channels)
        )).astype(dtype))
        return w0, s0  # activations C, synergies S
    h0 = jnp.asarray(avg * np.abs(r.standard_normal(
        (args.batch, args.rank, args.channels))).astype(dtype))
    return w0, h0


def _differenced_timing(timed_chain, repeats, clip=(10, 2000)):
    """Median differenced chain timing; returns seconds per call.

    The shared relay-aware protocol: ``timed_chain(n_calls, seed)``
    must run ``n_calls`` dependent calls with seed-FRESH inputs (so
    repeats are never byte-identical and the relay's result cache
    cannot serve them) and end in a scalar readback.  Differencing two
    chain lengths cancels fixed dispatch/transfer latency; a
    non-finite or non-positive median falls back to the long-chain
    average — a strict upper bound per call, so the reported number is
    an underestimate of speed, never nonsense.
    """
    timed_chain(1, seed=999)  # warm-up: compile

    def diff_measure(k1, k2, seed):
        t1 = timed_chain(k1, seed=seed)
        t2 = timed_chain(k2, seed=seed + 1)
        return (t2 - t1) / (k2 - k1)

    # size the longer chain so its compute dwarfs the relay jitter
    est = diff_measure(2, 12, seed=5000)
    if not np.isfinite(est) or est <= 0:
        est = 5e-3
    k2 = 2 + int(np.clip(round(2.0 / est), *clip))
    samples = [
        diff_measure(2, k2, seed=1000 + 10 * rep) for rep in range(repeats)
    ]
    per_call = float(np.median(samples))
    if not np.isfinite(per_call) or per_call <= 0:
        per_call = timed_chain(k2, seed=4242) / k2
    return per_call


def _measure_per_call(step_fn, xs, args, dtype, avg):
    """Seconds per ``step_fn`` call (``args.iters`` iterations each).

    The whole chain of dependent calls runs inside ONE jitted
    ``fori_loop`` (one executable launch), so per-call dispatch never
    pollutes the per-iteration number — through a remote-device relay
    each separate launch costs milliseconds, which at 1000 iters/call
    understates kernel throughput by ~35%.  Fresh factors per chain
    defeat transparent result caching; the scalar readback forces
    execution to complete even where ``block_until_ready`` can return
    optimistically.  The loop bound is a traced argument, so both
    chain lengths share one compilation.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(xs, w, h, n_calls):
        def body(_, wh):
            w, h = wh
            return step_fn(xs, w, h, args.iters)

        w, h = jax.lax.fori_loop(0, n_calls, body, (w, h))
        # factor slots may be pytrees (nm3f carries (A, S) in slot 2)
        leaves = jax.tree_util.tree_leaves((w, h))
        return sum(jnp.sum(x) for x in leaves)

    def timed_chain(n_calls, seed):
        w, h = _fresh_factors(args, dtype, seed, avg)
        t0 = time.perf_counter()
        float(chain(xs, w, h, jnp.int32(n_calls)))
        return time.perf_counter() - t0

    return _differenced_timing(timed_chain, args.repeats)


def run_iters(args):
    """Headline metric: solver iterations/sec/chip."""
    import jax.numpy as jnp

    impl = _resolve_impl(args.impl, args.solver)
    step_fn = _make_step(impl, args.batch, args.solver)
    dtype = jnp.dtype(args.dtype)
    x_np = _make_problem(args, dtype, args.solver)
    xs = jnp.asarray(x_np)
    if args.solver == "nm3f":
        avg = _nm3f_avg(x_np, args.rank, args.spatial)
    else:
        denom = args.rank * (args.lags if args.solver == "cnmf" else 1)
        avg = float(np.sqrt(x_np.mean() / denom))

    per_call = _measure_per_call(step_fn, xs, args, dtype, avg)
    iters_per_sec = args.iters / per_call
    lag_note = f", lags={args.lags}" if args.solver == "cnmf" else ""
    if args.solver == "nm3f":
        lag_note = f", Q={args.spatial}"
    impl_note = impl
    # The 10k target is defined for plain-NMF iterations; one
    # convolutive iteration does ~lags x that work (every projection is
    # a D-deep lag stack), so cnmf normalizes by the lag count to stay
    # comparable: lag-slice updates per second vs the same bar.
    effective = iters_per_sec * (args.lags if args.solver == "cnmf" else 1)
    record = {
        "metric": f"{args.solver}_nmf_iterations_per_sec_per_chip",
        "value": round(iters_per_sec, 2),
        "unit": f"iter/s (batch={args.batch}x{args.samples}x"
                f"{args.channels}, k={args.rank}{lag_note}, "
                f"{dtype.name}, {impl_note}"
                + (", vs_baseline = lag-normalized"
                   if args.solver == "cnmf" else "") + ")",
        "vs_baseline": round(effective / 10_000.0, 4),
    }
    if args.solver != "mu":
        # the headline MU line keeps the driver's exact 4-key schema;
        # the per-solver artifact lines carry a date stamp
        record["date"] = _utc_date()
    print(json.dumps(record))
    return 0


def run_vaf(args):
    """Second metric: time to >= ``vaf_target`` VAF across the batch.

    The batch is the calibrated gait regime (see
    :func:`_make_gait_problem`), so the iteration count is a real
    convergence problem, not the ~10-iteration synthetic one the old
    artifact recorded.  The convergence loop runs entirely on device
    (one dispatch, scalar readback); its iteration count is priced at
    the measured kernel throughput.  ``vs_baseline`` compares against
    sklearn NMF solving the same problems one trial at a time on the
    host — the reference's execution model — measured on a small
    sample and scaled.
    """
    import jax
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.batch import init_batch, vaf_batch

    impl = _resolve_impl(args.impl)
    step_fn = _make_step(impl, args.batch, args.solver)
    dtype = jnp.dtype(args.dtype)
    # the calibrated gait batch (already pipeline-normalized)
    x_np = _make_gait_problem(args, dtype, args.solver)
    xs = jnp.asarray(x_np)

    # nndsvda: the sklearn-default init family the reference inherits
    # (random init reaches 90% several iterations sooner here)
    w0, h0 = init_batch(xs, args.rank, init="nndsvda", seed=1)
    w0, h0 = w0.astype(dtype), h0.astype(dtype)

    chunk = 1  # exact iteration count (the batch min-VAF is checked
    # after every update; the priced time covers the updates alone)
    max_iter = 500
    target = args.vaf_target

    @jax.jit
    def run_to_vaf(xs, w, h):
        def cond(c):
            _, _, n, done = c
            return jnp.logical_and(~done, n < max_iter)

        def body(c):
            w, h, n, _ = c
            w, h = step_fn(xs, w, h, chunk)
            overall, _ = vaf_batch(xs, w, h)
            return w, h, n + chunk, jnp.all(overall >= target)

        _, _, n, done = jax.lax.while_loop(
            cond, body, (w, h, jnp.int32(0), jnp.array(False))
        )
        return n, done

    n_iter, done = run_to_vaf(xs, w0, h0)
    n_iter = int(n_iter)
    if not bool(done):
        print(json.dumps({
            "metric": f"time_to_{int(target * 100)}pct_vaf",
            "value": -1,
            "unit": f"not reached in {n_iter} iters",
            "vs_baseline": 0,
        }))
        return 1

    avg = float(np.sqrt(x_np.mean() / args.rank))
    per_call = _measure_per_call(step_fn, xs, args, dtype, avg)
    seconds = n_iter * per_call / args.iters

    # reference execution model: sklearn NMF per trial, host CPU
    sk_per_trial = _sklearn_time_per_trial(
        x_np, args.rank, n_iter, args.solver
    )
    sk_total = sk_per_trial * args.batch

    print(json.dumps({
        "metric": f"time_to_{int(target * 100)}pct_vaf",
        "value": round(seconds * 1e3, 3),
        "unit": f"ms for {args.batch} calibrated-gait trials "
                f"({n_iter} {args.solver} iters, rank={args.rank}, "
                f"{impl}; sklearn same-iters trial-by-trial: "
                f"{sk_total:.1f} s)",
        "vs_baseline": round(sk_total / seconds, 1),
        "date": _utc_date(),
    }))
    return 0


def run_fit(args):
    """Convergence-fit wall time: the whole batch solved to tolerance.

    Times the per-trial-stopping fit (``fit_mu_batch`` /
    ``fit_cd_batch`` / ``fit_mu_beta_batch`` / ``fit_cnmf_batch``) for
    the resolved
    ``--impl`` (and, when it is the pallas path, the XLA twin as the
    baseline) with the shared relay-aware protocol: chains of
    dependent fits inside one jitted ``fori_loop``, seed-fresh factor
    uploads per chain so the relay's result cache never serves a
    repeat, differenced over two chain lengths to cancel
    dispatch/transfer latency.  ``vs_baseline`` is the XLA/pallas
    wall-time ratio (1.0 when only XLA runs).
    """
    import contextlib

    import jax
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.batch import (
        fit_cd_batch,
        fit_mu_batch,
        fit_mu_beta_batch,
    )

    dtype = jnp.dtype(args.dtype)
    x_np = _make_problem(args, dtype, args.solver)
    xs = jnp.asarray(x_np)
    if args.solver == "nm3f":
        avg = _nm3f_avg(x_np, args.rank, args.spatial)
    else:
        avg = float(np.sqrt(x_np.mean() / args.rank))
    max_iter, tol = 500, 1e-4

    def make_fit(impl):
        # block_b=None lets the fit pick the largest dividing block
        if args.solver == "mu":
            def fit(xs, w, h):
                return fit_mu_batch(
                    xs, w, h, max_iter=max_iter, tol=tol, impl=impl
                )
        elif args.solver == "cd":
            def fit(xs, w, h):
                return fit_cd_batch(
                    xs, w, h, max_iter=max_iter, tol=tol, impl=impl
                )
        elif args.solver == "nm3f":
            from muscle_synergies_tpu.models.nm3f import fit_nm3f

            def fit(xs, w, a_s):
                a, s = a_s
                return fit_nm3f(xs, w, a, s, max_iter=max_iter, tol=tol)
        elif args.solver == "cnmf":
            from muscle_synergies_tpu.models.cnmf import fit_cnmf_batch

            # block_b=None lets fit_cnmf_batch pick the legal tile
            # (128 for multiples, whole-batch for <= 128) and raise a
            # clear error for batch sizes with no legal Pallas tile
            def fit(xs, c, s):
                return fit_cnmf_batch(
                    xs, c, s, max_iter=max_iter, tol=tol, impl=impl,
                )
        else:
            beta = 1.0 if args.solver == "kl" else 0.0

            def fit(xs, w, h):
                return fit_mu_beta_batch(
                    xs, w, h, beta=beta, max_iter=max_iter, tol=tol,
                    impl=impl,
                )
        return fit

    def time_impl(impl):
        fit = make_fit(impl)

        @jax.jit
        def chain(xs, w, h, n_calls):
            def body(i, acc):
                state = fit(xs, w * (1.0 + 1e-4 * i.astype(dtype)), h)
                # field 0 is W for the NMF states, C for CNMFState
                return acc + jnp.sum(state[0]) + jnp.sum(
                    state.n_iter.astype(dtype)
                )

            return jax.lax.fori_loop(
                0, n_calls, body, jnp.zeros((), dtype)
            )

        def timed_chain(n_calls, seed):
            w, h = _fresh_factors(args, dtype, seed, avg)
            t0 = time.perf_counter()
            float(chain(xs, w, h, jnp.int32(n_calls)))
            return time.perf_counter() - t0

        return _differenced_timing(timed_chain, args.repeats, clip=(4, 200))

    impl = _resolve_impl(args.impl, args.solver)
    if impl == "pallas":
        ctx = contextlib.nullcontext()
        if jax.default_backend() != "tpu":
            # explicit --impl pallas off-TPU: interpret-mode plumbing
            # check, not a perf number
            from jax.experimental.pallas import tpu as pltpu

            ctx = pltpu.force_tpu_interpret_mode()
        with ctx:
            main_s = time_impl("pallas")
        xla_s = time_impl("xla")
    else:
        main_s = xla_s = time_impl("xla")
    print(json.dumps({
        "metric": f"{args.solver}_fit_ms_batch",
        "value": round(main_s * 1e3, 3),
        "unit": f"ms per full {args.batch}-trial fit to tol={tol:g} "
                f"(max_iter={max_iter}, {impl}; xla={xla_s * 1e3:.1f} ms)",
        "vs_baseline": round(xla_s / main_s, 2),
        "date": _utc_date(),
    }))
    return 0


_SKLEARN_SOLVER = {
    "mu": ("mu", "frobenius"),
    "cd": ("cd", "frobenius"),
    "kl": ("mu", "kullback-leibler"),
    "is": ("mu", "itakura-saito"),
}


def _sklearn_time_per_trial(x_np, rank, n_iter, solver="mu"):
    """Median sklearn wall time to run the same solve on one trial."""
    from sklearn.decomposition import NMF

    sk_solver, beta_loss = _SKLEARN_SOLVER[solver]
    times = []
    for b in range(min(4, x_np.shape[0])):
        model = NMF(
            n_components=rank, solver=sk_solver, beta_loss=beta_loss,
            init="nndsvda", max_iter=n_iter, tol=0.0, random_state=0,
        )
        t0 = time.perf_counter()
        model.fit_transform(np.asarray(x_np[b], dtype=np.float64))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _mu_reference_f64(x, w, h, iters):
    """float64 host reference of the MU iteration (sklearn semantics)."""
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    h = h.astype(np.float64)
    for _ in range(iters):
        den = w @ (h @ h.T)
        w = w * ((x @ h.T) / np.where(den == 0, EPSILON, den))
        den = (w.T @ w) @ h
        h = h * ((w.T @ x) / np.where(den == 0, EPSILON, den))
    return w, h


def _kl_reference_f64(x, w, h, iters):
    """float64 host reference of the KL MU iteration (sklearn semantics)."""
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    h = h.astype(np.float64)
    f64_eps = np.finfo(np.float64).eps
    for _ in range(iters):
        quot = x / np.maximum(w @ h, EPSILON)
        den = h.sum(axis=1)
        w = w * ((quot @ h.T) / np.where(den == 0, EPSILON, den)[None, :])
        quot = x / np.maximum(w @ h, EPSILON)
        w_sum = w.sum(axis=0)
        w_sum = np.where(w_sum == 0, 1.0, w_sum)
        h = h * ((w.T @ quot) / w_sum[:, None])
        h[h < f64_eps] = 0.0
    return w, h


def _beta_reference_f64(x, w, h, iters, beta):
    """float64 host reference of the generic-beta MU iteration.

    sklearn's ``_multiplicative_update_w/_h`` for an arbitrary float
    ``beta_loss``: numerator ``X*(WH)^(beta-2)`` (clamped for beta<2),
    denominator ``(WH)^(beta-1)`` (clamped for beta<1), gamma damping,
    and the beta<1 / beta<=1 stability flushes.
    """
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    h = h.astype(np.float64)
    f64_eps = np.finfo(np.float64).eps
    if beta < 1.0:
        gamma = 1.0 / (2.0 - beta)
    elif beta > 2.0:
        gamma = 1.0 / (beta - 1.0)
    else:
        gamma = 1.0
    for _ in range(iters):
        wh = w @ h
        whn = np.maximum(wh, EPSILON) if beta < 2.0 else wh
        whd = np.maximum(wh, EPSILON) if beta < 1.0 else wh
        num = (x * whn ** (beta - 2.0)) @ h.T
        den = whd ** (beta - 1.0) @ h.T
        den[den == 0] = EPSILON
        delta = num / den
        if gamma != 1.0:
            delta = delta**gamma
        w = w * delta
        if beta < 1.0:
            w[w < f64_eps] = 0.0
        wh = w @ h
        whn = np.maximum(wh, EPSILON) if beta < 2.0 else wh
        whd = np.maximum(wh, EPSILON) if beta < 1.0 else wh
        num = w.T @ (x * whn ** (beta - 2.0))
        den = w.T @ whd ** (beta - 1.0)
        den[den == 0] = EPSILON
        delta = num / den
        if gamma != 1.0:
            delta = delta**gamma
        h = h * delta
        if beta <= 1.0:
            h[h < f64_eps] = 0.0
    return w, h


def _cnmf_reference_f64(x, c, s, iters):
    """float64 host reference of the convolutive MU iteration.

    The Smaragdis-style update of ``models.cnmf.cnmf_update`` in plain
    numpy: per-lag S projections against causally shifted activations,
    then the ratio-of-sums C update with the fresh S.
    """
    x = x.astype(np.float64)
    c = c.astype(np.float64)
    s = s.astype(np.float64)
    t = c.shape[0]
    n_lags = s.shape[1]

    def shift_down(m, d):
        if d == 0:
            return m
        out = np.zeros_like(m)
        out[d:] = m[: t - d]
        return out

    def shift_up(m, d):
        if d == 0:
            return m
        out = np.zeros_like(m)
        out[: t - d] = m[d:]
        return out

    def reconstruct(cm, sm):
        return sum(
            shift_down(cm, d) @ sm[:, d, :] for d in range(n_lags)
        )

    for _ in range(iters):
        cs = [shift_down(c, d) for d in range(n_lags)]
        xhat = reconstruct(c, s)
        s_new = s.copy()
        for d in range(n_lags):
            num = cs[d].T @ x
            den = cs[d].T @ xhat
            den[den == 0] = EPSILON
            s_new[:, d, :] = s[:, d, :] * (num / den)
        s = s_new
        xhat = reconstruct(c, s)
        num = np.zeros_like(c)
        den = np.zeros_like(c)
        for d in range(n_lags):
            num += shift_up(x @ s[:, d, :].T, d)
            den += shift_up(xhat @ s[:, d, :].T, d)
        den[den == 0] = EPSILON
        c = c * (num / den)
    return c, s


def _cd_reference_f64(x, w, h, iters):
    """float64 host reference of the CD/HALS outer iteration.

    sklearn ``_update_coordinate_descent`` with ``shuffle=False``: a
    cyclic Newton pass over W's components (H fixed), then the same
    pass over Ht via X.T — the update order of
    ``muscle_synergies_tpu.models.hals.fit_cd`` and the CD Pallas
    kernel.
    """
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    ht = h.astype(np.float64).T  # (L, k)

    def cd_pass(xm, wm, htm):
        hht = htm.T @ htm
        xht = xm @ htm
        for s in range(htm.shape[1]):
            grad = wm @ hht[:, s] - xht[:, s]
            hess = hht[s, s]
            if hess != 0:
                wm[:, s] = np.maximum(wm[:, s] - grad / hess, 0.0)
        return wm

    for _ in range(iters):
        w = cd_pass(x, w, ht)
        ht = cd_pass(x.T, ht, w)
    return w, ht.T


def _fit_mu_reference_f64(x, w, h, max_iter=200, tol=1e-4, check_every=10):
    """float64 host reference of the full MU convergence fit.

    The update of :func:`_mu_reference_f64` plus the exact stopping
    rule of ``models.mu.fit_mu`` (sklearn semantics): every
    ``check_every`` iterations compute the Frobenius error and stop
    when ``(prev - err) / err_init < tol``.

    Returns ``(snapshots, n_iter)`` with the checkpoint-snapshot
    contract of :func:`_fit_beta_reference_f64`: snapshots at every
    possible device stop point (checkpoint multiples plus
    ``max_iter``), ``n_iter`` where the rule first fires.
    """
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    h = h.astype(np.float64)
    err_init = np.linalg.norm(x - w @ h)
    prev = err_init
    n_iter = None
    snapshots = {0: (w, h)}
    for it in range(1, max_iter + 1):
        den = w @ (h @ h.T)
        w = w * ((x @ h.T) / np.where(den == 0, EPSILON, den))
        den = (w.T @ w) @ h
        h = h * ((w.T @ x) / np.where(den == 0, EPSILON, den))
        if it % check_every == 0 or it == max_iter:
            snapshots[it] = (w, h)
        if tol > 0 and it % check_every == 0 and n_iter is None:
            err = np.linalg.norm(x - w @ h)
            if (prev - err) / err_init < tol:
                n_iter = it
            prev = err
    if n_iter is None:
        n_iter = max_iter
    return snapshots, n_iter


def _fit_cd_reference_f64(x, w, h, max_iter=200, tol=1e-4,
                          snapshot_until=None):
    """float64 host reference of the full CD convergence fit.

    The pass of :func:`_cd_reference_f64` extended with sklearn's
    stopping statistic (``models.hals.fit_cd`` semantics): the summed
    absolute projected gradient over both passes, converged when
    ``violation / violation_init <= tol`` with ``violation_init`` the
    first iteration's total.

    Returns ``(snapshots, n_iter)`` with the checkpoint-snapshot
    contract of :func:`_fit_beta_reference_f64` — except CD tests
    convergence every iteration (sklearn), so snapshots cover EVERY
    iteration count.  ``snapshot_until`` bounds the run: once the
    stopping rule has fired AND ``snapshot_until`` iterations are
    snapshotted, later iterates can't be needed and the loop exits
    (pass the largest device stop you will look up).
    """
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    ht = h.astype(np.float64).T

    def cd_pass(xm, wm, htm):
        hht = htm.T @ htm
        xht = xm @ htm
        violation = 0.0
        for s in range(htm.shape[1]):
            grad = wm @ hht[:, s] - xht[:, s]
            pg = np.where(wm[:, s] == 0.0, np.minimum(grad, 0.0), grad)
            violation += float(np.abs(pg).sum())
            hess = hht[s, s]
            if hess != 0:
                wm[:, s] = np.maximum(wm[:, s] - grad / hess, 0.0)
        return wm, violation

    violation_init = 0.0
    n_iter = None
    snapshots = {0: (w.copy(), ht.T.copy())}
    for it in range(1, max_iter + 1):
        w, vw = cd_pass(x, w, ht)
        ht, vh = cd_pass(x.T, ht, w)
        violation = vw + vh
        snapshots[it] = (w.copy(), ht.T.copy())
        if it == 1:
            violation_init = violation
        if n_iter is None and (
            violation_init == 0 or violation / violation_init <= tol
        ):
            n_iter = it
        if (
            n_iter is not None
            and snapshot_until is not None
            and it >= snapshot_until
        ):
            break
    if n_iter is None:
        n_iter = max_iter
    return snapshots, n_iter


def _beta_divergence_f64(x, w, h, beta):
    """float64 host twin of ``models.beta.beta_divergence`` (sqrt form).

    Reproduces sklearn's ``_beta_divergence`` semantics exactly as the
    device implementation does: data-dependent terms masked to
    ``x > EPSILON``, the Itakura-Saito constant counting *all* entries,
    and the final ``sqrt(2 * max(res, 0))``.
    """
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    h = h.astype(np.float64)
    wh = w @ h
    if beta == 2.0:
        return float(np.linalg.norm(x - wh))
    mask = x > EPSILON
    whc = np.maximum(wh, EPSILON)
    div = np.where(mask, x / whc, 1.0)
    if beta == 1.0:
        res = (
            np.sum(np.where(mask, x * np.log(div), 0.0))
            + w.sum(axis=0) @ h.sum(axis=1)
            - np.sum(np.where(mask, x, 0.0))
        )
    elif beta == 0.0:
        res = (
            np.sum(np.where(mask, div, 0.0))
            - x.size
            - np.sum(np.where(mask, np.log(div), 0.0))
        )
    else:
        sum_wh_beta = np.sum(wh**beta)
        sum_x_wh = np.sum(np.where(mask, x * whc ** (beta - 1.0), 0.0))
        res = np.sum(np.where(mask, x**beta, 0.0)) - beta * sum_x_wh
        res = (res + sum_wh_beta * (beta - 1.0)) / (beta * (beta - 1.0))
    return float(np.sqrt(2.0 * max(res, 0.0)))


def _fit_beta_reference_f64(
    x, w, h, beta, max_iter=200, tol=1e-4, check_every=10
):
    """float64 host reference of the full beta-divergence fit.

    The per-iteration updates of :func:`_kl_reference_f64` /
    :func:`_is_reference_f64` / :func:`_beta_reference_f64` plus the
    exact stopping rule of ``models.beta.fit_mu_beta`` (and of the
    chunked Pallas path ``models.batch._fit_beta_batch_pallas``): every
    ``check_every`` iterations compute ``sqrt(2 * divergence)`` and
    stop when ``(prev - err) / err_init < tol``.

    Returns ``(snapshots, n_iter)``: ``snapshots`` maps every
    checkpoint iteration count (multiples of ``check_every`` up to
    ``max_iter``, plus ``max_iter`` itself if a tail remains) to its
    float64 ``(w, h)`` iterates, and ``n_iter`` is where the fit's own
    stopping rule first fires.  Keeping all checkpoints lets callers
    compare a device fit's factors against the f64 iterates *at the
    device's own stopping iteration* — the well-posed comparison when
    an f32 near-threshold stopping decision flips by one checkpoint
    (the iterates past a stop are unaffected by the stopping decision,
    so later snapshots equal a no-stop run of that length).
    """
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    h = h.astype(np.float64)

    def step(w, h, iters):
        if beta == 1.0:
            return _kl_reference_f64(x, w, h, iters)
        if beta == 0.0:
            return _is_reference_f64(x, w, h, iters)
        return _beta_reference_f64(x, w, h, iters, beta)

    err_init = _beta_divergence_f64(x, w, h, beta)
    prev = err_init
    n_iter = None
    snapshots = {0: (w, h)}
    n = 0
    n_full = (max_iter // check_every) * check_every
    while n < n_full:
        w, h = step(w, h, check_every)
        n += check_every
        snapshots[n] = (w, h)
        if n_iter is None:
            err = _beta_divergence_f64(x, w, h, beta)
            if err_init == 0.0 or (prev - err) / err_init < tol:
                n_iter = n
            prev = err
    if max_iter > n_full:  # unchecked tail chunk, like the device path
        w, h = step(w, h, max_iter - n_full)
        snapshots[max_iter] = (w, h)
    if n_iter is None:
        n_iter = max_iter
    return snapshots, n_iter


def _cnmf_recon_f64(c, s):
    """float64 convolutive reconstruction ``Σ_d shift_down(C, d) @ S_d``."""
    t = c.shape[0]
    out = np.zeros((t, s.shape[2]), dtype=np.float64)
    for d in range(s.shape[1]):
        shifted = np.zeros_like(c)
        shifted[d:] = c[: t - d]
        out += shifted @ s[:, d, :]
    return out


def _fit_cnmf_reference_f64(x, c, s, max_iter=200, tol=1e-4, check_every=10):
    """float64 host reference of the full convolutive fit.

    The update of :func:`_cnmf_reference_f64` plus the exact stopping
    rule of ``models.cnmf.fit_cnmf`` / ``_fit_cnmf_batch_pallas``:
    every ``check_every`` iterations compute the Frobenius error and
    stop when ``(prev - err) / max(err_init, EPSILON) < tol``.

    Returns ``(snapshots, n_iter)`` with the same checkpoint-snapshot
    contract as :func:`_fit_beta_reference_f64` (the chunked device
    path may overshoot ``max_iter`` by up to one chunk; snapshots
    cover that final checkpoint too).
    """
    x = x.astype(np.float64)
    c = c.astype(np.float64)
    s = s.astype(np.float64)
    err_init = float(np.linalg.norm(x - _cnmf_recon_f64(c, s)))
    prev = err_init
    n_iter = None
    snapshots = {0: (c, s)}
    n = 0
    n_last = ((max_iter + check_every - 1) // check_every) * check_every
    while n < n_last:
        c, s = _cnmf_reference_f64(x, c, s, check_every)
        n += check_every
        snapshots[n] = (c, s)
        if n_iter is None:
            err = float(np.linalg.norm(x - _cnmf_recon_f64(c, s)))
            if (prev - err) / max(err_init, EPSILON) < tol:
                n_iter = n
            prev = err
    if n_iter is None:
        n_iter = n_last
    return snapshots, n_iter


def _is_reference_f64(x, w, h, iters):
    """float64 host reference of the Itakura-Saito MU iteration."""
    x = x.astype(np.float64)
    w = w.astype(np.float64)
    h = h.astype(np.float64)
    f64_eps = np.finfo(np.float64).eps
    for _ in range(iters):
        inv = 1.0 / np.maximum(w @ h, EPSILON)
        den = inv @ h.T
        den[den == 0] = EPSILON
        w = w * np.sqrt(((x * inv * inv) @ h.T) / den)
        w[w < f64_eps] = 0.0
        inv = 1.0 / np.maximum(w @ h, EPSILON)
        den = w.T @ inv
        den[den == 0] = EPSILON
        h = h * np.sqrt((w.T @ (x * inv * inv)) / den)
        h[h < f64_eps] = 0.0
    return w, h


def _factor_err(w_dev, h_dev, w_ref, h_ref):
    """Max relative error of device factors vs float64 references."""
    return max(
        np.max(np.abs(w_dev - w_ref)) / np.max(np.abs(w_ref)),
        np.max(np.abs(h_dev - h_ref)) / np.max(np.abs(h_ref)),
    )


def run_check(args):
    """Device-numerics validation of the Pallas kernels.

    Runs every hot kernel — MU, CD/HALS, KL, Itakura-Saito,
    convolutive-NMF iterations and the fused filtfilt — on the
    *active* platform (real TPU when
    available; interpret mode elsewhere) and compares against float64
    host references.  Documented f32 tolerances: solver iterations
    <= 1e-3 max relative error after 50 updates (20 for IS); fused
    filtfilt <= 5e-4 relative to signal scale even for an
    ill-conditioned 10 Hz / 2 kHz lowpass, ~60x tighter than the XLA
    f32 scan's ~1e-2 on the same problem (the pure-f32 VPU kernels are
    *more* accurate than the XLA f32 paths, whose TPU matmuls round
    through bf16 MXU passes).
    """
    import jax
    import jax.numpy as jnp
    from scipy import signal as sps

    from muscle_synergies_tpu.models.kernels import (
        beta_mu_iterations_pallas,
        cd_iterations_pallas,
        kl_mu_iterations_pallas,
        mu_iterations_pallas,
    )
    from muscle_synergies_tpu.ops.filter_pallas import sosfiltfilt_pallas
    from muscle_synergies_tpu.ops.filters import sos_design

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    rng = np.random.default_rng(0)

    # --- MU kernel: 50 iterations vs float64 host reference ---
    b, n, l, k, iters = 128, 200, 8, 4, 50
    if args.quick:
        b, iters = 16, 20
    x = rng.random((b, n, l)).astype(np.float32)
    w0 = np.abs(rng.standard_normal((b, n, k))).astype(np.float32)
    h0 = np.abs(rng.standard_normal((b, k, l))).astype(np.float32)
    xs, ws, hs = jnp.asarray(x), jnp.asarray(w0), jnp.asarray(h0)
    wp, hp = mu_iterations_pallas(
        xs, ws, hs, iters, block_b=b, interpret=interpret,
    )
    wp, hp = np.asarray(wp), np.asarray(hp)
    mu_err = 0.0
    for i in range(b):
        wr, hr = _mu_reference_f64(x[i], w0[i], h0[i], iters)
        mu_err = max(mu_err, _factor_err(wp[i], hp[i], wr, hr))

    # --- CD/HALS kernel (sklearn's default-solver twin) ---
    wc, hc = cd_iterations_pallas(
        xs, ws, hs, iters, block_b=b, interpret=interpret,
    )
    wc, hc = np.asarray(wc), np.asarray(hc)
    cd_err = 0.0
    for i in range(b):
        wr, hr = _cd_reference_f64(x[i], w0[i], h0[i], iters)
        cd_err = max(cd_err, _factor_err(wc[i], hc[i], wr, hr))

    # --- KL-loss MU kernel vs float64 host reference ---
    wk, hk = kl_mu_iterations_pallas(
        xs, ws, hs, iters, block_b=b, interpret=interpret,
    )
    wk, hk = np.asarray(wk), np.asarray(hk)
    kl_err = 0.0
    for i in range(b):
        wr, hr = _kl_reference_f64(x[i], w0[i], h0[i], iters)
        kl_err = max(kl_err, _factor_err(wk[i], hk[i], wr, hr))

    # --- Itakura-Saito branch (beta=0) vs a float64 host reference ---
    x_pos = x + np.float32(0.05)  # IS requires strictly positive data
    is_iters = min(iters, 20)
    wi, hi = beta_mu_iterations_pallas(
        jnp.asarray(x_pos), ws, hs, is_iters,
        beta=0.0, block_b=b, interpret=interpret,
    )
    wi, hi = np.asarray(wi), np.asarray(hi)
    is_err = 0.0
    for i in range(b):
        wr, hr = _is_reference_f64(x_pos[i], w0[i], h0[i], is_iters)
        is_err = max(is_err, _factor_err(wi[i], hi[i], wr, hr))

    # --- generic-beta branch (beta=1.5) vs a float64 host reference ---
    wb, hb = beta_mu_iterations_pallas(
        xs, ws, hs, iters, beta=1.5, block_b=b, interpret=interpret,
    )
    wb, hb = np.asarray(wb), np.asarray(hb)
    b15_err = 0.0
    for i in range(b):
        wr, hr = _beta_reference_f64(x[i], w0[i], h0[i], iters, 1.5)
        b15_err = max(b15_err, _factor_err(wb[i], hb[i], wr, hr))

    # --- convolutive-NMF kernel vs a float64 host reference ---
    from muscle_synergies_tpu.models.kernels import cnmf_iterations_pallas

    d_lags = 6
    cn_iters = min(iters, 20)  # the f64 loop reference is O(B·D·iters)
    c0 = rng.uniform(0.1, 1.0, (b, n, 4)).astype(np.float32)
    s0 = rng.uniform(0.1, 1.0, (b, 4, d_lags, l)).astype(np.float32)
    x_cn = rng.uniform(0.1, 1.0, (b, n, l)).astype(np.float32)
    cp, sp = cnmf_iterations_pallas(
        jnp.asarray(x_cn), jnp.asarray(c0), jnp.asarray(s0), cn_iters,
        block_b=b, interpret=interpret,
    )
    cp, sp = np.asarray(cp), np.asarray(sp)
    cn_err = 0.0
    for i in range(b):
        cr, sr = _cnmf_reference_f64(x_cn[i], c0[i], s0[i], cn_iters)
        cn_err = max(cn_err, _factor_err(cp[i], sp[i], cr, sr))

    # --- convergence-fit kernels: the fused in-VMEM stopping
    # machinery (while_loop carries, converged-lane freezing) that the
    # fixed-iteration checks above never exercise.  The reference is a
    # float64 HOST fit with the exact same stopping rules — NOT the
    # XLA device fit: on TPU the XLA path's update matmuls round
    # through bf16 MXU passes, so two f32 device paths cannot
    # arbitrate each other (measured 2026-08-19: pallas-vs-xla fitcd
    # drift 3.2e-1 on chip while pallas-vs-f64 is small).  Uniform
    # methodology for every family: factor error is measured against
    # the f64 SNAPSHOT at each device path's own stopping iteration
    # (iterate accuracy, well-posed under near-threshold stopping
    # flips), and stopping drift |n_dev - n_f64| gates separately.
    # The XLA fit still runs; its error vs the same f64 reference is
    # reported alongside for the accuracy narrative but does not
    # gate. ---
    from muscle_synergies_tpu.models.batch import fit_cd_batch, fit_mu_batch
    from muscle_synergies_tpu.models.kernels import (
        fit_cd_pallas,
        fit_mu_pallas,
    )

    fit_kw = dict(max_iter=200, tol=1e-4)
    fm = fit_mu_pallas(xs, ws, hs, block_b=b, interpret=interpret, **fit_kw)
    fm_xla = fit_mu_batch(xs, ws, hs, impl="xla", **fit_kw)
    fm_w, fm_h = np.asarray(fm[0]), np.asarray(fm[1])
    fmx_w, fmx_h = np.asarray(fm_xla.w), np.asarray(fm_xla.h)
    fm_n = np.asarray(fm[2], dtype=np.int64)
    fmx_n = np.asarray(fm_xla.n_iter, dtype=np.int64)
    fitmu_err = fitmu_xla_err = 0.0
    fitmu_gap = 0
    for i in range(b):
        snaps, nr = _fit_mu_reference_f64(x[i], w0[i], h0[i], **fit_kw)
        wr, hr = snaps[int(fm_n[i])]
        fitmu_err = max(fitmu_err, _factor_err(fm_w[i], fm_h[i], wr, hr))
        wrx, hrx = snaps[int(fmx_n[i])]
        fitmu_xla_err = max(
            fitmu_xla_err, _factor_err(fmx_w[i], fmx_h[i], wrx, hrx)
        )
        fitmu_gap = max(fitmu_gap, abs(int(fm_n[i]) - nr))

    fc = fit_cd_pallas(xs, ws, hs, block_b=b, interpret=interpret, **fit_kw)
    fc_xla = fit_cd_batch(xs, ws, hs, impl="xla", **fit_kw)
    fc_w, fc_h = np.asarray(fc[0]), np.asarray(fc[1])
    fcx_w = np.asarray(fc_xla.w)
    fcx_h = np.asarray(jnp.swapaxes(fc_xla.ht, -1, -2))
    fc_n = np.asarray(fc[2], dtype=np.int64)
    fcx_n = np.asarray(fc_xla.n_iter, dtype=np.int64)
    fitcd_err = fitcd_xla_err = 0.0
    fitcd_gap = 0
    for i in range(b):
        snaps, nr = _fit_cd_reference_f64(
            x[i], w0[i], h0[i], max_iter=fit_kw["max_iter"],
            tol=fit_kw["tol"],
            snapshot_until=max(int(fc_n[i]), int(fcx_n[i])),
        )
        wr, hr = snaps[int(fc_n[i])]
        fitcd_err = max(fitcd_err, _factor_err(fc_w[i], fc_h[i], wr, hr))
        wrx, hrx = snaps[int(fcx_n[i])]
        fitcd_xla_err = max(
            fitcd_xla_err, _factor_err(fcx_w[i], fcx_h[i], wrx, hrx)
        )
        fitcd_gap = max(fitcd_gap, abs(int(fc_n[i]) - nr))

    # --- beta-divergence convergence fits (KL beta=1, IS beta=0): the
    # chunked production path (Pallas update chunks interleaved with
    # XLA divergence checks, models.batch._fit_beta_batch_pallas) vs
    # the same float64 host fit.  Two separate, well-posed questions:
    # (a) are the ITERATES right? — compare factors against the f64
    # snapshot at the DEVICE fit's own stopping iteration (an f32
    # near-threshold stopping decision can legitimately flip by one
    # checkpoint; comparing factors across different stop points would
    # conflate iterate accuracy with that flip and report the
    # between-checkpoint update delta, ~4e-2, as "error"); (b) does
    # the STOPPING track f64? — bound |n_dev - n_f64| by one
    # check_every checkpoint.  The XLA vmapped fit runs alongside for
    # the accuracy narrative, compared at ITS own stopping iteration.
    from muscle_synergies_tpu.models.batch import (
        _fit_beta_batch_pallas,
        fit_mu_beta_batch,
    )

    fit_iter = 200 if not args.quick else 50
    beta_fit = {}
    for name, beta_v, x_fit in (("fitkl", 1.0, x), ("fitis", 0.0, x_pos)):
        xs_fit = jnp.asarray(x_fit)
        st = _fit_beta_batch_pallas(
            xs_fit, ws, hs, beta_v, fit_iter, 1e-4, 10, b,
            interpret=interpret,
        )
        st_xla = fit_mu_beta_batch(
            xs_fit, ws, hs, beta=beta_v, max_iter=fit_iter, tol=1e-4,
            impl="xla",
        )
        fw, fh = np.asarray(st.w), np.asarray(st.h)
        fxw, fxh = np.asarray(st_xla.w), np.asarray(st_xla.h)
        fn = np.asarray(st.n_iter, dtype=np.int64)
        fxn = np.asarray(st_xla.n_iter, dtype=np.int64)
        err = xla_err = 0.0
        gap = 0
        for i in range(b):
            snaps, nr = _fit_beta_reference_f64(
                x_fit[i], w0[i], h0[i], beta_v, max_iter=fit_iter,
                tol=1e-4,
            )
            wr, hr = snaps[int(fn[i])]
            err = max(err, _factor_err(fw[i], fh[i], wr, hr))
            wrx, hrx = snaps[int(fxn[i])]
            xla_err = max(xla_err, _factor_err(fxw[i], fxh[i], wrx, hrx))
            gap = max(gap, abs(int(fn[i]) - nr))
        beta_fit[name] = (err, gap, xla_err)

    # --- convolutive convergence fit: the chunked Pallas path
    # (models.cnmf._fit_cnmf_batch_pallas) vs the float64 host fit.
    # No XLA leg here: the einsum path's f64 drift is already pinned on
    # chip by BENCH_CNMF_TILES.json (default vs precision='highest'),
    # and the vmapped XLA convolutive fit is a heavy extra compile. ---
    from muscle_synergies_tpu.models.cnmf import _fit_cnmf_batch_pallas

    st_cn = _fit_cnmf_batch_pallas(
        jnp.asarray(x_cn), jnp.asarray(c0), jnp.asarray(s0),
        fit_iter, 1e-4, 10, b, interpret=interpret,
    )
    fcn_c, fcn_s = np.asarray(st_cn.c), np.asarray(st_cn.s)
    fcn_n = np.asarray(st_cn.n_iter, dtype=np.int64)
    fitcn_err = 0.0
    fitcn_gap = 0
    for i in range(b):
        snaps, nr = _fit_cnmf_reference_f64(
            x_cn[i], c0[i], s0[i], max_iter=fit_iter, tol=1e-4,
        )
        cr, sr = snaps[int(fcn_n[i])]
        fitcn_err = max(fitcn_err, _factor_err(fcn_c[i], fcn_s[i], cr, sr))
        fitcn_gap = max(fitcn_gap, abs(int(fcn_n[i]) - nr))

    # --- fused filtfilt kernel vs scipy float64 ---
    # EMG-envelope-like signal: low-frequency content the 10 Hz lowpass
    # passes (white noise would leave a tiny-scale output that inflates
    # the *relative* error without any extra absolute error)
    sos = sos_design(4, 10.0, 2000.0)
    n_sig = 2048 if args.quick else 8192
    t = np.arange(n_sig) / 2000.0
    tones = np.stack(
        [np.sin(2 * np.pi * (1.0 + 0.7 * c) * t) for c in range(8)], axis=1
    )
    sig = (tones + 0.1 * rng.standard_normal((n_sig, 8))).astype(np.float32)
    y_pallas = np.asarray(
        sosfiltfilt_pallas(sos, jnp.asarray(sig), interpret=interpret)
    )
    y_ref = sps.sosfiltfilt(sos, sig.astype(np.float64), axis=0)
    ff_err = float(np.max(np.abs(y_pallas - y_ref)) / np.max(np.abs(y_ref)))

    # --- vmapped (multi-trial) filtfilt: the batched dataset path ---
    import jax

    sigs = np.stack([sig, sig[::-1].copy(), np.roll(sig, 100, axis=0)])
    run_batch = jax.vmap(
        lambda x: sosfiltfilt_pallas(sos, x, interpret=interpret)
    )
    ys_batch = np.asarray(run_batch(jnp.asarray(sigs)))
    batch_err = 0.0
    for i in range(sigs.shape[0]):
        ref_i = sps.sosfiltfilt(sos, sigs[i].astype(np.float64), axis=0)
        batch_err = max(
            batch_err,
            float(np.max(np.abs(ys_batch[i] - ref_i)) / np.max(np.abs(ref_i))),
        )

    mu_tol, ff_tol = 1e-3, 5e-4
    # f32 stopping vs the f64 HOST fit: measured pallas errors are
    # 2.5e-6 (MU) / 3.6e-4 (CD) with gap 0, so the gate sits ~5x above
    # the worst measured value — a bf16-XLA-like drift (1e0 / gap 74)
    # fails loudly instead of slipping under an oversized tolerance.
    fit_tol, fit_gap_max = 2e-3, 2
    ff_err = max(ff_err, batch_err)
    solver_errs = {
        "mu": mu_err, "cd": cd_err, "kl": kl_err, "is": is_err,
        "beta1.5": b15_err, "cnmf": cn_err,
    }
    fits_ok = (
        fitmu_err <= fit_tol and fitcd_err <= fit_tol
        and fitmu_gap <= fit_gap_max and fitcd_gap <= fit_gap_max
    )
    # KL/IS/cNMF chunked fits: the error gate bounds ITERATE accuracy
    # (factors vs the f64 snapshot at the device's own stopping
    # iteration); the gap gate separately allows ONE check_every=10
    # checkpoint of stopping drift — a near-threshold relative-
    # improvement decision is not always reproducible in f32, and the
    # beta divergences' log/reciprocal terms make the statistic
    # noisier than Frobenius.  A bf16-rounded stopping statistic still
    # fails loudly (chip-measured 2026-08-19: gap 160 on KL before the
    # Precision.HIGHEST check matmuls; <= 10 after).
    fitkl_err, fitkl_gap, fitkl_xla_err = beta_fit["fitkl"]
    fitis_err, fitis_gap, fitis_xla_err = beta_fit["fitis"]
    chunk_fits_ok = all(
        e <= fit_tol and g <= 10
        for e, g in (
            (fitkl_err, fitkl_gap),
            (fitis_err, fitis_gap),
            (fitcn_err, fitcn_gap),
        )
    )
    ok = (
        all(e <= mu_tol for e in solver_errs.values())
        and ff_err <= ff_tol
        and fits_ok
        and chunk_fits_ok
    )
    worst = max(max(solver_errs.values()), ff_err)
    print(json.dumps({
        "metric": "kernel_parity_max_rel_err",
        "value": float(f"{worst:.3e}"),
        "unit": (
            " ".join(f"{s}={e:.2e}" for s, e in solver_errs.items())
            + f" (tol {mu_tol:g}), filtfilt={ff_err:.2e} (tol {ff_tol:g}), "
            f"fitmu={fitmu_err:.2e}/gap{fitmu_gap} "
            f"fitcd={fitcd_err:.2e}/gap{fitcd_gap} "
            f"(tol {fit_tol:g}/gap{fit_gap_max}, vs f64 host fit; "
            f"xla fit errs {fitmu_xla_err:.2e}/{fitcd_xla_err:.2e}), "
            f"fitkl={fitkl_err:.2e}/gap{fitkl_gap} "
            f"fitis={fitis_err:.2e}/gap{fitis_gap} "
            f"fitcnmf={fitcn_err:.2e}/gap{fitcn_gap} "
            f"(tol {fit_tol:g}/gap10; "
            f"xla kl/is {fitkl_xla_err:.2e}/{fitis_xla_err:.2e}), "
            f"platform={jax.default_backend()}"
            f"{' interpret' if interpret else ''}"
        ),
        "vs_baseline": 1.0 if ok else 0.0,
        "date": _utc_date(),
    }))
    return 0 if ok else 1


def _backend_reachable(timeout_s: int = 240) -> bool:
    """Probe the accelerator backend in a killable subprocess.

    When the remote-TPU relay is down, the in-process PJRT client init
    HANGS for ~25 minutes before erroring; probing in a subprocess
    with a timeout turns that into a fast, clear failure.  Only used
    when the ambient platform is the remote plugin — forced-CPU runs
    initialize instantly and skip the probe.
    """
    import os
    import subprocess

    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return True
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0


def main(argv=None):
    args = _parse_args(argv)
    # pure argument validation first — before the backend probe, which
    # can spend minutes discovering that the remote relay is down
    if args.metric == "vaf" and args.solver in ("cnmf", "nm3f"):
        raise SystemExit(
            "--metric vaf measures the plain-NMF time-to-VAF "
            "problem; it supports --solver mu/cd/kl/is only"
        )
    if args.solver == "nm3f" and args.impl == "pallas":
        raise SystemExit(
            "--solver nm3f has no Pallas twin (the trilinear updates "
            "are batched MXU einsums); use --impl auto or xla"
        )
    if not _backend_reachable():
        print(json.dumps({
            "metric": "backend_unreachable",
            "value": 0,
            "unit": "accelerator backend failed to initialize within the "
                    "probe window (remote-TPU relay down?); no "
                    "measurement taken",
            "vs_baseline": 0,
            "date": _utc_date(),
        }))
        return 1
    if args.quick:
        # keep 3 repeats: with tiny per-call compute the chain
        # differencing needs a median to survive relay jitter
        args.batch, args.iters, args.repeats = 32, 50, 3
    if args.check:
        return run_check(args)
    if args.metric == "vaf":
        return run_vaf(args)
    if args.metric == "fit":
        return run_fit(args)
    return run_iters(args)


if __name__ == "__main__":
    sys.exit(main())
