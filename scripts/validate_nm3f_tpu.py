"""Real-chip validation of the NM3F / shared-factor family numerics.

The space-by-time solvers (``models/nm3f.py``: the full trilinear
NM3F plus its frozen-identity tMod/sMod specializations, reference
analysis.py:848-864 is the solver-family center) run on the XLA path
— batched MXU einsums whose f32 matmuls default to bf16 passes on
TPU.  The cNMF einsum path measured 5.8e-3 vs float64 under the same
rounding (see BENCH_CNMF_TILES.json / CLAUDE.md), so this script pins
the equivalent numbers for the NM3F family on the actual device, the
way ``scripts/validate_cnmf_tpu.py`` pinned the convolutive tiles:

* fixed-iteration f32 chip fits vs an independent float64 host oracle
  for the full model and both frozen specializations
  (``update_w``/``update_s`` legs);
* the same legs with ``precision="highest"`` (multi-pass f32 MXU
  arithmetic) — the knob every NM3F entry point threads — which must
  recover f32-level parity (1e-4 gate vs the ~1e-2 bf16 default);
* a default-vs-highest throughput case at the bench shape
  (chained fori_loop iterations, fresh factors per call, scalar
  readback — the relay result-cache rules from CLAUDE.md);
* ``sharded_fit_nm3f`` on a (1, 1) device mesh vs the local
  ``fit_nm3f`` on identical inputs — same arithmetic through the
  shard_map/collective plumbing, so the gate is tight (1e-4).

Run on the real chip (ambient axon env)::

    python scripts/validate_nm3f_tpu.py

Prints one JSON line per case (and a trailing summary row suitable
for BENCH_NM3F.json).  Exit status 0 iff every case passes: 5e-2 for
the default f32-vs-f64 legs (bf16 MXU rounding expected at ~1e-3),
1e-4 for the ``precision="highest"`` legs and sharded-vs-local.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

EPS = np.finfo(np.float64).eps  # sklearn EPSILON, as in models/nm3f.py

F64_TOL = 5e-2
HIGHEST_TOL = 1e-4
SHARD_TOL = 1e-4


def _nm3f_reference_f64(xs, w, a, s, iters, update_w=True, update_s=True):
    """Float64 host mirror of ``nm3f_update`` (A-then-W-then-S order)."""
    xs = xs.astype(np.float64)
    w = w.astype(np.float64)
    a = a.astype(np.float64)
    s = s.astype(np.float64)
    for _ in range(iters):
        wtw = w.T @ w
        sst = s @ s.T
        num_a = np.einsum("tp,btl,ql->bpq", w, xs, s)
        den_a = np.einsum("pr,brm,mq->bpq", wtw, a, sst)
        a = a * (num_a / np.where(den_a == 0, EPS, den_a))
        if update_w:
            num_w = np.einsum("btl,ql,bpq->tp", xs, s, a)
            gram_w = np.einsum("bpq,qm,brm->pr", a, sst, a)
            den_w = w @ gram_w
            w = w * (num_w / np.where(den_w == 0, EPS, den_w))
        if update_s:
            wtw = w.T @ w
            num_s = np.einsum("bpq,tp,btl->ql", a, w, xs)
            gram_s = np.einsum("bpq,pr,brm->qm", a, wtw, a)
            den_s = gram_s @ s
            s = s * (num_s / np.where(den_s == 0, EPS, den_s))
    return w, a, s


def _rel_err(got, want):
    want = np.asarray(want, dtype=np.float64)
    scale = np.max(np.abs(want))
    return float(np.max(np.abs(np.asarray(got, np.float64) - want)) / scale)


def _chip_iterations(xs, w0, a0, s0, iters, update_w, update_s,
                     precision=None):
    import functools

    import jax
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.nm3f import nm3f_update

    @functools.partial(jax.jit, static_argnums=(4,))
    def run(xs, w, a, s, n):
        def one(_, was):
            return nm3f_update(
                xs, *was, update_w=update_w, update_s=update_s,
                precision=precision,
            )

        return jax.lax.fori_loop(0, n, one, (w, a, s))

    w, a, s = run(
        jnp.asarray(xs), jnp.asarray(w0), jnp.asarray(a0), jnp.asarray(s0),
        iters,
    )
    return np.asarray(w), np.asarray(a), np.asarray(s)


def _case_vs_f64(name, update_w, update_s, b=16, t=50, l=8, p=3, q=2,
                 iters=20, precision=None):
    rng = np.random.default_rng(hash(name) % 2**31)
    xs = rng.uniform(0.1, 1.0, (b, t, l)).astype(np.float32)
    if not update_s:  # tMod: spatial side frozen at identity
        q = l
        s0 = np.eye(q, l, dtype=np.float32)
    else:
        s0 = rng.uniform(0.1, 1.0, (q, l)).astype(np.float32)
    if not update_w:  # sMod: temporal side frozen at identity
        p = t
        w0 = np.eye(t, p, dtype=np.float32)
    else:
        w0 = rng.uniform(0.1, 1.0, (t, p)).astype(np.float32)
    a0 = rng.uniform(0.1, 1.0, (b, p, q)).astype(np.float32)

    w, a, s = _chip_iterations(
        xs, w0, a0, s0, iters, update_w, update_s, precision=precision
    )
    wr, ar, sr = _nm3f_reference_f64(
        xs, w0, a0, s0, iters, update_w=update_w, update_s=update_s
    )
    err = max(
        _rel_err(w, wr) if update_w else 0.0,
        _rel_err(a, ar),
        _rel_err(s, sr) if update_s else 0.0,
    )
    tol = HIGHEST_TOL if precision == "highest" else F64_TOL
    row = {
        "case": name,
        "shape": [b, t, l, p, q],
        "iters": iters,
        "max_rel_err_vs_f64": float(f"{err:.3e}"),
        "status": "ok" if err <= tol else "numerics_fail",
    }
    if precision is not None:
        row["precision"] = precision
    return row


def _case_throughput(b=1024, t=200, l=8, p=4, q=3, iters=2000, reps=3):
    """Default-vs-highest iteration throughput at the bench shape.

    The relay timing rules (CLAUDE.md): fresh factors per call (the
    result cache serves identical calls), one fused chain per timing
    (fori_loop), scalar readback before the clock stops.  Differences
    two chain lengths so compile/dispatch overhead cancels.
    """
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.nm3f import nm3f_update

    rng = np.random.default_rng(42)
    xs = jnp.asarray(rng.uniform(0.1, 1.0, (b, t, l)).astype(np.float32))

    rates = {}
    for precision in (None, "highest"):
        @functools.partial(jax.jit, static_argnums=(4,))
        def run(xs, w, a, s, n):
            def one(_, was):
                return nm3f_update(xs, *was, precision=precision)

            w, a, s = jax.lax.fori_loop(0, n, one, (w, a, s))
            return jnp.sum(w) + jnp.sum(a) + jnp.sum(s)

        def timed(n, seed):
            r = np.random.default_rng(seed)
            w0 = jnp.asarray(r.uniform(0.1, 1.0, (t, p)).astype(np.float32))
            a0 = jnp.asarray(
                r.uniform(0.1, 1.0, (b, p, q)).astype(np.float32)
            )
            s0 = jnp.asarray(r.uniform(0.1, 1.0, (q, l)).astype(np.float32))
            start = time.perf_counter()
            float(run(xs, w0, a0, s0, n))
            return time.perf_counter() - start

        timed(1, 0)  # compile both chain lengths before timing
        timed(1 + iters, 1)
        deltas = [
            timed(1 + iters, 10 + i) - timed(1, 100 + i)
            for i in range(reps)
        ]
        rates[precision or "default"] = iters / float(np.median(deltas))

    return {
        "case": "throughput",
        "shape": [b, t, l, p, q],
        "iters_per_sec_default": round(rates["default"], 1),
        "iters_per_sec_highest": round(rates["highest"], 1),
        "highest_slowdown": round(
            rates["default"] / rates["highest"], 2
        ),
        "status": "ok",
    }


def _case_sharded(b=16, t=50, l=8, p=3, q=2, max_iter=100, tol=1e-5):
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.nm3f import fit_nm3f
    from muscle_synergies_tpu.parallel import make_mesh
    from muscle_synergies_tpu.parallel.nm3f import sharded_fit_nm3f

    rng = np.random.default_rng(7)
    xs = rng.uniform(0.1, 1.0, (b, t, l)).astype(np.float32)
    w0 = rng.uniform(0.1, 1.0, (t, p)).astype(np.float32)
    a0 = rng.uniform(0.1, 1.0, (b, p, q)).astype(np.float32)
    s0 = rng.uniform(0.1, 1.0, (q, l)).astype(np.float32)

    mesh = make_mesh((1, 1))
    local = fit_nm3f(
        jnp.asarray(xs), jnp.asarray(w0), jnp.asarray(a0), jnp.asarray(s0),
        max_iter=max_iter, tol=tol,
    )
    shard = sharded_fit_nm3f(
        jnp.asarray(xs), jnp.asarray(w0), jnp.asarray(a0), jnp.asarray(s0),
        mesh, max_iter=max_iter, tol=tol,
    )
    err = max(
        _rel_err(shard.w, np.asarray(local.w)),
        _rel_err(shard.a, np.asarray(local.a)),
        _rel_err(shard.s, np.asarray(local.s)),
    )
    same_stop = int(shard.n_iter) == int(local.n_iter)
    ok = err <= SHARD_TOL and same_stop
    return {
        "case": "sharded_vs_local",
        "shape": [b, t, l, p, q],
        "n_iter_local": int(local.n_iter),
        "n_iter_sharded": int(shard.n_iter),
        "max_rel_err_vs_local": float(f"{err:.3e}"),
        "status": "ok" if ok else "numerics_fail",
    }


def main():
    import jax

    device = jax.devices()[0]
    print(json.dumps({"case": "device", "device": str(device)}), flush=True)

    rows = [
        _case_vs_f64("nm3f_full", update_w=True, update_s=True),
        _case_vs_f64("tmod_frozen_s", update_w=True, update_s=False),
        _case_vs_f64("smod_frozen_w", update_w=False, update_s=True,
                     t=20),  # P = T when W is frozen: keep A small
        _case_vs_f64("nm3f_full_highest", update_w=True, update_s=True,
                     precision="highest"),
        _case_vs_f64("tmod_highest", update_w=True, update_s=False,
                     precision="highest"),
        _case_vs_f64("smod_highest", update_w=False, update_s=True,
                     t=20, precision="highest"),
        _case_throughput(),
        _case_sharded(),
    ]
    ok = True
    worst = 0.0
    for row in rows:
        print(json.dumps(row), flush=True)
        if row["status"] != "ok":
            ok = False
        worst = max(worst, row.get("max_rel_err_vs_f64", 0.0))
    print(json.dumps({
        "metric": "nm3f_chip_parity_max_rel_err",
        "value": worst,
        "unit": (
            "f32 XLA chip fits vs f64 host oracle, 20 iters "
            f"(default-precision tol {F64_TOL:g}; precision='highest' "
            f"legs tol {HIGHEST_TOL:g}); sharded-vs-local tol "
            f"{SHARD_TOL:g}"
        ),
        "vs_baseline": 1.0 if ok else 0.0,
        "date": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
        "device": str(device),
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
