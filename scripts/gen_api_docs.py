#!/usr/bin/env python
"""Regenerate docs/api.md from the package's public surface.

Walks ``__all__`` of the top-level package and each documented
submodule, emitting one-line summaries (first docstring line) in the
table format docs/api.md uses.  Run on the CPU backend:

    python scripts/gen_api_docs.py > docs/api.md
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MODULES = [
    ("muscle_synergies_tpu.io", None),
    ("muscle_synergies_tpu.ops", None),
    ("muscle_synergies_tpu.models", None),
    ("muscle_synergies_tpu.models.kernels", None),
    ("muscle_synergies_tpu.parallel", None),
    ("muscle_synergies_tpu.segment", None),
    ("muscle_synergies_tpu.utils", None),
    ("muscle_synergies_tpu.dataset", None),
    ("muscle_synergies_tpu.analysis", None),
    ("muscle_synergies_tpu.viz", None),
]


def kind_of(obj) -> str:
    if inspect.isclass(obj):
        return "class"
    if inspect.ismodule(obj):
        return "module"
    if not callable(obj):
        return "constant"
    return "function"


def summary_of(obj) -> str:
    if kind_of(obj) == "constant":
        return ""  # a constant's "docstring" is its type's
    doc = inspect.getdoc(obj) or ""
    line = doc.splitlines()[0].strip() if doc else ""
    return line.replace("|", "\\|")


def table(mod, names):
    rows = ["| Name | Kind | Summary |", "|---|---|---|"]
    for name in sorted(names):
        obj = getattr(mod, name)
        rows.append(f"| `{name}` | {kind_of(obj)} | {summary_of(obj)} |")
    return "\n".join(rows)


def main():
    top = importlib.import_module("muscle_synergies_tpu")
    out = [
        "# API reference",
        "",
        "One-line summaries of every public name; see docstrings for "
        "details.",
        "",
        "## Top level (`muscle_synergies_tpu`)",
        "",
    ]
    top_names = set(top.__all__)
    # documented submodules appear in the top-level table too
    for mod_name, _ in MODULES:
        short = mod_name.split(".")[-1]
        if hasattr(top, short):
            top_names.add(short)
    out.append(table(top, top_names))
    for mod_name, _ in MODULES:
        mod = importlib.import_module(mod_name)
        names = getattr(mod, "__all__", None)
        if names is None:
            names = [n for n in dir(mod) if not n.startswith("_")]
        out += ["", f"## `{mod_name}`", "", table(mod, names)]
    print("\n".join(out))


if __name__ == "__main__":
    main()
