"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests exercise the distributed code paths without TPU hardware by
forcing the CPU platform with 8 virtual devices.  float64 is enabled so
numerical parity tests against scipy/sklearn can compare at tight
tolerances; library code is dtype-explicit, so this does not change the
TPU execution path.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
