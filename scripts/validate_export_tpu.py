"""Chip-validate the StableHLO serving path (models/export.py).

Run on the machine with the real TPU (ambient axon env — do NOT
replace PYTHONPATH; the plugin loads from sitecustomize):

    python scripts/validate_export_tpu.py | tee BENCH_EXPORT.json

For each estimator family this builds a fitted model from synthetic
factors (no training fit needed — the persistence layer's restore path
constructs estimators the same way), exports its transform lowered for
``("cpu", "tpu")``, reloads the serialized bytes, and executes the
artifact on the TPU:

- ``serves``: the cross-platform claim — bytes produced by
  ``jax.export`` replay on the chip.
- ``parity_vs_live``: max |served - jit(live model)| relative error on
  the same device (both run the identical program; this pins the
  serialization round trip, expected ~0).
- ``ms_per_call``: median wall ms per served call with FRESH inputs
  and a scalar readback per call (relay rules: identical calls can be
  served from the result cache, so every call gets new data).
- the NM3F artifact is exported with a SYMBOLIC batch dim and executed
  at two batch sizes.

Emits one JSON line per case plus a ``summary`` line; exit 1 if any
case fails.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from muscle_synergies_tpu.models import (  # noqa: E402
    CNMFModel,
    NM3FModel,
    NMFModel,
    export_transform,
    load_transform,
)

RNG = np.random.default_rng(0)


def _fitted_nmf(n=200, l=8, k=4) -> NMFModel:
    model = NMFModel(n_components=k, max_iter=200, tol=1e-4)
    model.components_ = RNG.uniform(0.1, 1.0, size=(k, l)).astype(np.float32)
    model.n_components_ = k
    model.n_iter_ = 0
    model.reconstruction_err_ = 0.0
    return model


def _fitted_cnmf(k=2, d=10, l=8) -> CNMFModel:
    model = CNMFModel(k, d, max_iter=100, tol=1e-4, impl="xla")
    s = RNG.uniform(0.1, 1.0, size=(k, d, l)).astype(np.float32)
    model.synergies_ = s / np.linalg.norm(s, axis=(1, 2), keepdims=True)
    model.n_components_, model.n_lags_ = k, d
    model.n_iter_ = 0
    model.reconstruction_err_ = 0.0
    model.restart_errors_ = np.zeros(1, np.float32)
    return model


def _fitted_nm3f(t=200, l=8, p=4, q=3) -> NM3FModel:
    model = NM3FModel(p, q, max_iter=100, tol=1e-4)
    w = RNG.uniform(0.1, 1.0, size=(t, p)).astype(np.float32)
    s = RNG.uniform(0.1, 1.0, size=(q, l)).astype(np.float32)
    model.temporal_modules_ = w / np.linalg.norm(w, axis=0)
    model.spatial_modules_ = s / np.linalg.norm(s, axis=1, keepdims=True)
    model.n_temporal_, model.n_spatial_ = p, q
    model.n_iter_ = 0
    model.reconstruction_err_ = 0.0
    model.restart_errors_ = np.zeros(1, np.float32)
    model.vaf_ = 0.0
    return model


def _time_served(fn, make_input, repeats=5):
    """Median wall ms per call, fresh inputs, scalar readback each."""
    times = []
    for _ in range(repeats):
        x = make_input()
        t0 = time.perf_counter()
        out = fn(x)
        float(np.sum(out))  # scalar readback gates completion
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def _case(name, model, shape, make_input, live_fn):
    row = {"case": name, "shape": list(shape)}
    try:
        blob = export_transform(model, shape)  # f32, ("cpu","tpu")
        fn = load_transform(blob)
        x = make_input()
        served = fn(x)
        live = np.asarray(jax.jit(live_fn)(jnp.asarray(x)))
        denom = np.maximum(np.abs(live), 1e-6)
        row["parity_vs_live"] = float(
            np.max(np.abs(served - live) / denom)
        )
        row["ms_per_call"] = _time_served(fn, make_input)
        row["bytes"] = len(blob)
        row["status"] = (
            "ok"
            if np.isfinite(served).all() and row["parity_vs_live"] < 1e-5
            else "parity_fail"
        )
    except Exception as exc:  # noqa: BLE001 — report, don't crash the sweep
        row["status"] = f"error: {type(exc).__name__}: {exc}"[:200]
    return row


def main() -> None:
    print(json.dumps({
        "case": "device", "device": str(jax.devices()[0]),
        "platforms_lowered": ["cpu", "tpu"],
    }), flush=True)

    nmf = _fitted_nmf()
    cnmf = _fitted_cnmf()
    nm3f = _fitted_nm3f()

    def nmf_in():
        return RNG.uniform(0.1, 1.0, size=(200, 8)).astype(np.float32)

    def cnmf_in():
        return RNG.uniform(0.1, 1.0, size=(200, 8)).astype(np.float32)

    def nm3f_in_b(b):
        return lambda: RNG.uniform(
            0.1, 1.0, size=(b, 200, 8)
        ).astype(np.float32)

    rows = [
        _case("nmf_cd", nmf, (200, 8), nmf_in,
              lambda x: nmf._transform_jax(x)[0]),
        _case("cnmf", cnmf, (200, 8), cnmf_in, cnmf._transform_jax),
    ]
    # one symbolic-batch artifact, exercised at two batch sizes
    try:
        blob = export_transform(nm3f, ("b", 200, 8))
        fn = load_transform(blob)
        live = jax.jit(nm3f._transform_jax)
        for b in (8, 64):
            x = nm3f_in_b(b)()
            served = fn(x)
            ref = np.asarray(live(jnp.asarray(x)))
            denom = np.maximum(np.abs(ref), 1e-6)
            rows.append({
                "case": f"nm3f_symbolic_b{b}",
                "shape": ["b", 200, 8],
                "parity_vs_live": float(
                    np.max(np.abs(served - ref) / denom)
                ),
                "ms_per_call": _time_served(fn, nm3f_in_b(b)),
                "status": "ok" if np.isfinite(served).all() else "nan",
            })
    except Exception as exc:  # noqa: BLE001
        rows.append({
            "case": "nm3f_symbolic",
            "status": f"error: {type(exc).__name__}: {exc}"[:200],
        })

    ok = True
    for row in rows:
        print(json.dumps(row), flush=True)
        if row.get("status") != "ok":
            ok = False
    print(json.dumps({"case": "summary", "ok": ok}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
