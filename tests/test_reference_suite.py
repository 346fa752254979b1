"""Run the REFERENCE's own functional test suite against our package.

The ultimate drop-in check: the reference's pytest suite
(reference tests/func/test_data_loading.py — golden-file assertions on
names, device types, units, cell-exact DataFrames, sampling
frequencies, frame/subframe round-trips and IndexError contracts)
executes unmodified from its own checkout with ``muscle_synergies``
resolving to THIS repo's compat package.  pytest-cases and pytest-mock
are not installable here, so a subprocess supplies the minimal shims
(tests/support/) the suite imports.

``TestFullData`` needs ``dynamic_trial.csv``, absent from the mirror
(.MISSING_LARGE_BLOBS); its every assertion is a deterministic
property, so the plugin redirects the ``full_data`` fixture to a
synthetic twin pinning the hardcoded expectations
(``testing.write_reference_fulldata_twin``) and the full battery runs
too.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_TESTS = "/root/reference/tests/func/test_data_loading.py"


@pytest.mark.skipif(
    not os.path.isfile(REFERENCE_TESTS),
    reason="reference checkout not available",
)
@pytest.mark.slow
def test_reference_functional_suite_passes_against_this_package(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, os.path.join(REPO, "tests", "support")]
    )
    env["PYTHONDONTWRITEBYTECODE"] = "1"  # never write into /root/reference
    env["JAX_PLATFORMS"] = "cpu"
    env["REFERENCE_FULLDATA_TWIN"] = str(tmp_path / "dynamic_trial_twin.csv")
    result = subprocess.run(
        [
            sys.executable, "-m", "pytest", REFERENCE_TESTS,
            "-q",
            "-p", "no:cacheprovider",
            "-p", "reference_suite_plugin",
            "-o", "addopts=",  # drop the reference ini's --doctest-modules
        ],
        cwd="/tmp",  # keep pytest artifacts out of both checkouts
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-2000:]
    summary = result.stdout.strip().splitlines()[-1]
    assert "passed" in summary and "failed" not in summary, summary
    # 50 abridged cases + the 19-case TestFullData battery; regressions
    # that silently deselect cases must not pass
    n_passed = int(summary.split(" passed")[0].split()[-1])
    assert n_passed >= 69, summary
