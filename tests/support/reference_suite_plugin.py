"""pytest plugin supplying what the reference's suite imports but this
sandbox lacks: the ``package_mocker`` fixture from pytest-mock
(reference tests/func/conftest.py:97-100 uses only ``.Mock()``)."""

from unittest import mock

import pytest


@pytest.fixture(scope="package")
def package_mocker():
    return mock
