"""The driver-facing scripts keep emitting their contracts.

Runs ``bench.py --quick`` and ``__graft_entry__.py`` as subprocesses on
the CPU platform and validates their outputs, so regressions in the
benchmark/entry plumbing surface in CI rather than at round end.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_bench_quick_emits_json_contract():
    result = _run(["bench.py", "--quick", "--impl", "xla"])
    assert result.returncode == 0, result.stderr[-2000:]
    line = result.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["metric"] == "mu_nmf_iterations_per_sec_per_chip"
    assert payload["value"] > 0


def test_graft_entry_runs_single_and_multichip():
    result = _run(["__graft_entry__.py"])
    assert result.returncode == 0, result.stderr[-2000:]
    assert "entry(): compiled and ran" in result.stdout
    assert "dryrun_multichip(8): OK" in result.stdout


def test_bench_vaf_metric_emits_json_contract():
    result = _run(["bench.py", "--quick", "--impl", "xla", "--metric", "vaf"])
    assert result.returncode == 0, result.stderr[-2000:]
    payload = json.loads(result.stdout.strip().splitlines()[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["metric"] == "time_to_90pct_vaf"
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 1  # faster than sklearn's trial loop


@pytest.mark.parametrize("solver", ["cd", "kl", "is", "cnmf", "nm3f"])
def test_bench_solver_axis_emits_json_contract(solver):
    """Every README throughput row reproduces from one harness."""
    result = _run(
        ["bench.py", "--quick", "--impl", "xla", "--solver", solver]
    )
    assert result.returncode == 0, result.stderr[-2000:]
    payload = json.loads(result.stdout.strip().splitlines()[-1])
    assert {"metric", "value", "unit", "vs_baseline", "date"} <= set(payload)
    assert payload["metric"] == f"{solver}_nmf_iterations_per_sec_per_chip"
    assert payload["value"] > 0


def test_bench_check_validates_kernel_numerics():
    result = _run(["bench.py", "--quick", "--check"], timeout=600)
    assert result.returncode == 0, result.stderr[-2000:]
    payload = json.loads(result.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "kernel_parity_max_rel_err"
    assert payload["vs_baseline"] == 1.0


def test_dryrun_with_more_devices_than_requested():
    """dryrun_multichip(n) must use the first n of >n available devices."""
    code = "import __graft_entry__ as g; g.dryrun_multichip(4); print('OK4')"
    result = _run(["-c", code])
    assert result.returncode == 0, result.stderr[-2000:]
    assert "OK4" in result.stdout


def test_bench_flag_validation_precedes_backend_probe():
    """Pure argument errors must not wait for the relay probe."""
    for flags, msg in [
        (["--solver", "nm3f", "--impl", "pallas"], "no Pallas twin"),
        (["--metric", "vaf", "--solver", "cnmf"], "mu/cd/kl/is only"),
    ]:
        result = _run(["bench.py", *flags], timeout=60)
        assert result.returncode != 0
        assert msg in result.stderr
