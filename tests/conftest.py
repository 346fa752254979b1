"""Test configuration: run JAX on a local virtual 8-device CPU mesh.

Tests exercise the distributed code paths without TPU hardware by
forcing the CPU platform with 8 virtual devices.  float64 is enabled so
numerical parity tests against scipy/sklearn can compare at tight
tolerances; library code is dtype-explicit, so this does not change the
TPU execution path.

Note: this sandbox presets ``JAX_PLATFORMS=axon`` (a remote-TPU PJRT
plugin loaded from ``sitecustomize`` before this file runs), so the
platform must be overridden through ``jax.config``, not the
environment.  The XLA flag below still works because the CPU client is
created lazily, after this conftest is imported.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: repeated test runs skip XLA compiles.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Free compiled executables between test modules.

    Every live XLA:CPU executable holds mmap'd JIT code sections; the
    full suite compiles enough distinct programs that the process
    crosses ``vm.max_map_count`` (~65k mappings) late in the run, at
    which point LLVM's section allocator mmap fails and the compiler
    SIGSEGVs (observed at ~96% of the suite, in whatever test compiles
    next).  Dropping the jit caches per module bounds the live count;
    the persistent disk cache above makes any cross-module recompiles
    cheap reloads.
    """
    yield
    jax.clear_caches()


def pytest_report_header():
    return f"jax devices: {jax.device_count()} x {jax.devices()[0].platform}"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tests (full-scale geometry, multi-process "
        "rendezvous); always part of the suite, marked for selection",
    )
