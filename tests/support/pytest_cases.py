"""Minimal ``pytest_cases`` stand-in for running the reference's tests.

The reference's functional suite uses three pytest-cases features
(reference tests/func/conftest.py:9-10, test_data_loading.py:6): the
``fixture``/``parametrize`` pair building "union" fixtures whose params
are other fixtures, and ``fixture_ref`` inside a test-method
``parametrize``.  pytest-cases is not installable in this sandbox, so
this shim implements exactly that subset with plain pytest:

- ``parametrize`` on a plain function attaches the params and returns
  a wrapper whose signature drops the parametrized names and gains a
  ``_shim_param`` pytest param + ``request``, resolving fixture
  references at call time via ``request.getfixturevalue``;
- ``fixture`` turns a parametrized function into a real pytest fixture
  with one param per referenced fixture;
- ``fixture_ref`` is a marker naming a fixture.

Only on ``sys.path`` for the subprocess that runs the reference suite
(tests/test_reference_suite.py); the main test session never sees it.
"""

from __future__ import annotations

import functools
import inspect

import pytest


class fixture_ref:  # noqa: N801 (pytest-cases API name)
    def __init__(self, target):
        self.name = target if isinstance(target, str) else target.__name__

    def __repr__(self):
        return self.name


def _id_of(value):
    if isinstance(value, tuple):
        return "-".join(_id_of(v) for v in value)
    if isinstance(value, fixture_ref):
        return value.name
    name = _fixture_name(value)
    if name is not None:
        return name
    return getattr(value, "__name__", repr(value))


def _fixture_name(value):
    """Fixture name of ``value``, or None if it is not a fixture.

    Handles plain marked functions (pytest < 8.4) and the
    ``FixtureFunctionDefinition`` wrapper newer pytest returns from
    ``@pytest.fixture``.
    """
    if isinstance(value, fixture_ref):
        return value.name
    if hasattr(value, "_pytestfixturefunction") or hasattr(
        value, "_shim_orig"
    ):
        return value.__name__
    inner = getattr(value, "_fixture_function", None) or getattr(
        value, "func", None
    )
    if "fixture" in type(value).__name__.lower():
        return getattr(inner, "__name__", None) or getattr(
            value, "__name__", None
        )
    return None


def _resolve(value, request):
    name = _fixture_name(value)
    if name is not None:
        return request.getfixturevalue(name)
    return value


#: union fixtures created by ``fixture`` below, name -> member values;
#: a ``fixture_ref`` to one of these in a test parametrize expands to
#: one case per member (pytest-cases' union semantics).  conftest.py is
#: imported before test modules, so the registry is filled in time.
_UNIONS: dict = {}


def _expand_unions(names, values):
    import itertools

    expanded = []
    for v in values:
        # a tuple value is a per-argname spread only for multi-name
        # parametrizes; for a single argname it IS the value
        tup = v if isinstance(v, tuple) and len(names) > 1 else (v,)
        options = []
        for entry in tup:
            if isinstance(entry, fixture_ref) and entry.name in _UNIONS:
                options.append(_UNIONS[entry.name])
            else:
                options.append([entry])
        for combo in itertools.product(*options):
            expanded.append(combo if len(names) > 1 else combo[0])
    return expanded


def parametrize(argnames, argvalues, **_kwargs):
    names = [a.strip() for a in argnames.split(",")]
    values = _expand_unions(names, list(argvalues))
    ids = [_id_of(v) for v in values]

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            request = kwargs.pop("request")
            chosen = kwargs.pop("_shim_param")
            vals = chosen if len(names) > 1 else (chosen,)
            resolved = dict(zip(names, (_resolve(v, request) for v in vals)))
            return fn(*args, **kwargs, **resolved)

        sig = inspect.signature(fn)
        kept = [p for n, p in sig.parameters.items() if n not in names]
        extra = [
            inspect.Parameter(
                "request", inspect.Parameter.POSITIONAL_OR_KEYWORD
            ),
            inspect.Parameter(
                "_shim_param", inspect.Parameter.POSITIONAL_OR_KEYWORD
            ),
        ]
        wrapper.__signature__ = sig.replace(parameters=kept + extra)
        wrapper._shim_params = (names, values, ids)
        wrapper._shim_orig = fn
        return pytest.mark.parametrize("_shim_param", values, ids=ids)(
            wrapper
        )

    return deco


def fixture(fn=None, **kwargs):
    if fn is None:
        return lambda f: fixture(f, **kwargs)
    names, values, ids = fn._shim_params
    orig = fn._shim_orig
    _UNIONS[orig.__name__] = values

    @pytest.fixture(params=values, ids=ids, name=orig.__name__)
    def shim_fixture(request):
        v = request.param
        vals = v if len(names) > 1 else (v,)
        return orig(*(_resolve(e, request) for e in vals))

    shim_fixture.__name__ = orig.__name__
    return shim_fixture
