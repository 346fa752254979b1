"""Real-chip validation of the cNMF Pallas tile-legality envelope.

The round-4 sessions that built the convolutive kernel ran with the
axon relay down, so two paths shipped validated only in interpret
mode (see TODO.md / CLAUDE.md):

* whole-batch blocks *below* 8 lanes (``cnmf_block_b`` admits any
  ``b <= 128``, but ``resolve_cnmf_impl`` refuses ``auto`` below 8 —
  is that caution or a real Mosaic limit?), and
* the ``auto``-resolved pallas-on-TPU route end to end
  (``cnmf_iterations_batch(impl="auto"...)`` semantics via
  ``resolve_cnmf_impl``).

This script runs both on the active device and prints one JSON line
per case: batch size, resolved impl, max relative error of the Pallas
factors vs a float64 host reference, and a pass/fail verdict
(tolerance 1e-3 after 20 updates, matching ``bench.py --check``).

Run on the real chip (ambient axon env)::

    python scripts/validate_cnmf_tpu.py

Exit status 0 iff every case passes, with one asymmetry by design:

* a remote *compile* failure for a sub-8-lane whole-batch tile counts
  as a documented-illegal case (reported as ``compile_error``) — the
  ``auto`` rule already refuses those shapes, so the outcome should
  gate widening the rule, not fail CI;
* a *numerics* failure gates at EVERY batch size, including b < 8:
  explicit ``impl="pallas"`` is user-reachable there (only ``auto``
  applies the >=8 lane-occupancy floor), so a tile that compiles but
  computes wrong answers is a shipped bug regardless of the floor.

Also validates the XLA einsum path's ``precision`` knob (the fallback
for Pallas-illegal tiles): the bf16-MXU default is expected at ~5e-3
vs float64 (informational, 5e-2 gate) and ``precision="highest"``
must recover f32-level parity (1e-4 gate) — the same contract the
NM3F family pins in ``scripts/validate_nm3f_tpu.py``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import _cnmf_reference_f64  # noqa: E402


def _case(b, n=200, l=8, k=4, d=6, iters=20):
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.cnmf import (
        cnmf_iterations_batch,
        resolve_cnmf_impl,
    )

    rng = np.random.default_rng(b)
    x = rng.uniform(0.1, 1.0, (b, n, l)).astype(np.float32)
    c0 = rng.uniform(0.1, 1.0, (b, n, k)).astype(np.float32)
    s0 = rng.uniform(0.1, 1.0, (b, k, d, l)).astype(np.float32)

    impl = resolve_cnmf_impl("auto", b)
    row = {"batch": b, "auto_impl": impl}
    try:
        cp, sp = cnmf_iterations_batch(
            jnp.asarray(x), jnp.asarray(c0), jnp.asarray(s0), iters,
            impl="pallas",
        )
        cp, sp = np.asarray(cp), np.asarray(sp)
    except Exception as e:  # remote Mosaic compile failures land here
        row.update(status="compile_error", error=type(e).__name__,
                   detail=str(e).splitlines()[0][:160])
        return row

    err = 0.0
    for i in range(b):
        cr, sr = _cnmf_reference_f64(x[i], c0[i], s0[i], iters)
        err = max(
            err,
            float(np.max(np.abs(cp[i] - cr)) / np.max(np.abs(cr))),
            float(np.max(np.abs(sp[i] - sr)) / np.max(np.abs(sr))),
        )
    row.update(status="ok" if err <= 1e-3 else "numerics_fail",
               max_rel_err=err)
    return row


def _case_xla_precision(precision, b=8, n=200, l=8, k=4, d=6, iters=20):
    """XLA einsum path accuracy vs f64 at the given matmul precision."""
    import jax.numpy as jnp

    from muscle_synergies_tpu.models.cnmf import cnmf_iterations_batch

    rng = np.random.default_rng(1000 + b)
    x = rng.uniform(0.1, 1.0, (b, n, l)).astype(np.float32)
    c0 = rng.uniform(0.1, 1.0, (b, n, k)).astype(np.float32)
    s0 = rng.uniform(0.1, 1.0, (b, k, d, l)).astype(np.float32)

    cp, sp = cnmf_iterations_batch(
        jnp.asarray(x), jnp.asarray(c0), jnp.asarray(s0), iters,
        impl="xla", precision=precision,
    )
    cp, sp = np.asarray(cp), np.asarray(sp)
    err = 0.0
    for i in range(b):
        cr, sr = _cnmf_reference_f64(x[i], c0[i], s0[i], iters)
        err = max(
            err,
            float(np.max(np.abs(cp[i] - cr)) / np.max(np.abs(cr))),
            float(np.max(np.abs(sp[i] - sr)) / np.max(np.abs(sr))),
        )
    tol = 1e-4 if precision == "highest" else 5e-2
    return {
        "case": "xla_precision",
        "precision": precision or "default",
        "batch": b,
        "max_rel_err": err,
        "status": "ok" if err <= tol else "numerics_fail",
    }


def main():
    import jax

    backend = jax.default_backend()
    print(json.dumps({"backend": backend,
                      "device": str(jax.devices()[0])}))
    # 4 = below the auto rule's >=8 floor; 8 = the floor; 100 = an odd
    # whole-batch tile; 256 = the multi-tile (block_b=128) grid path.
    ok = True
    for b in (4, 8, 100, 256):
        row = _case(b)
        print(json.dumps(row), flush=True)
        if row["status"] == "numerics_fail":
            ok = False  # impl="pallas" is user-reachable at any b
        if row["status"] == "compile_error" and b >= 8:
            ok = False  # >=8-lane tiles are the shipped envelope
    for precision in (None, "highest"):
        row = _case_xla_precision(precision)
        print(json.dumps(row), flush=True)
        if row["status"] != "ok":
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
