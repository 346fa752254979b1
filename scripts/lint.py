#!/usr/bin/env python
"""Static checks with zero third-party dependencies.

The reference gates CI on black/isort/mypy/pylint (reference
Makefile:103-109, .github/workflows/ci.yml); none of those tools is
available in this sandbox and installing packages is off-limits, so
this in-repo checker enforces the mechanical subset with the stdlib:

- syntax (every file must ``ast.parse``);
- line length <= 88 columns (``noqa`` or a URL exempts a line);
- no trailing whitespace, no tabs in indentation;
- no unused imports (token-based usage check; ``__init__.py``,
  ``conftest.py`` and ``noqa``-marked lines are exempt);
- no mutable default arguments.

When mypy/pylint ARE on PATH (e.g. a dev machine), ``make check`` runs
them too — see the Makefile.

Exit status 0 = clean; 1 = findings (printed one per line as
``path:line: message``).
"""

from __future__ import annotations

import ast
import io
import sys
import tokenize
from pathlib import Path

MAX_LINE = 88
EXEMPT_BASENAMES = {"__init__.py", "conftest.py"}


def iter_py_files(roots):
    for root in roots:
        path = Path(root)
        if path.is_file():
            yield path
        else:
            yield from sorted(path.rglob("*.py"))


def check_file(path: Path):
    findings = []
    src = path.read_text(encoding="utf-8")
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [(path, exc.lineno or 0, f"syntax error: {exc.msg}")]

    # Interior lines of multi-line strings (CSV fixtures, docstrings
    # quoting reference paths) are data, not code — exempt from the
    # length limit.
    # Interior lines only: the first and last lines of a multi-line
    # string hold the opening/closing quotes and surrounding code, so
    # they stay subject to every check.
    in_string = set()
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.STRING and tok.end[0] > tok.start[0]:
                in_string.update(range(tok.start[0] + 1, tok.end[0]))
    except tokenize.TokenError:
        pass

    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        if "noqa" in line or "http://" in line or "https://" in line:
            continue
        if i in in_string:  # data, not code — exempt from all line checks
            continue
        if len(line) > MAX_LINE:
            findings.append((path, i, f"line too long ({len(line)} > {MAX_LINE})"))
        if line != line.rstrip():
            findings.append((path, i, "trailing whitespace"))
        stripped = line.lstrip(" ")
        if stripped.startswith("\t") or line[: len(line) - len(stripped)].count("\t"):
            findings.append((path, i, "tab in indentation"))

    findings.extend(_unused_imports(path, tree, src))
    findings.extend(_mutable_defaults(path, tree))
    return findings


def _unused_imports(path: Path, tree: ast.Module, src: str):
    if path.name in EXEMPT_BASENAMES:
        return []
    lines = src.splitlines()
    imported = {}  # local name -> (lineno, display)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                name = alias.asname or alias.name.split(".")[0]
                imported[name] = (node.lineno, alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue  # compiler directive, never "used"
            for alias in node.names:
                if alias.name == "*":
                    continue
                name = alias.asname or alias.name
                imported[name] = (node.lineno, alias.name)

    # Token-based usage scan: a name is "used" if it appears as a
    # NAME token anywhere outside an import statement (ALL lines of
    # multi-line imports excluded, via end_lineno), or verbatim as an
    # ``__all__`` entry (re-export idiom).  Docstrings and other string
    # literals never count as usage.
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Assign, ast.AugAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            if any(
                isinstance(t, ast.Name) and t.id == "__all__" for t in targets
            ):
                for sub in ast.walk(node.value):
                    if isinstance(sub, ast.Constant) and isinstance(
                        sub.value, str
                    ):
                        used.add(sub.value)
    import_linenos = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            import_linenos.update(
                range(node.lineno, (node.end_lineno or node.lineno) + 1)
            )
    tokens = tokenize.generate_tokens(io.StringIO(src).readline)
    try:
        for tok in tokens:
            if tok.type == tokenize.NAME and tok.start[0] not in import_linenos:
                used.add(tok.string)
    except tokenize.TokenError:
        pass

    findings = []
    for name, (lineno, display) in sorted(imported.items()):
        if name in used:
            continue
        if lineno <= len(lines) and "noqa" in lines[lineno - 1]:
            continue
        findings.append((path, lineno, f"unused import: {display}"))
    return findings


def _mutable_defaults(path: Path, tree: ast.Module):
    findings = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        (path, node.lineno,
                         f"mutable default argument in {node.name}()")
                    )
    return findings


def main(argv):
    roots = argv or [
        "muscle_synergies_tpu", "muscle_synergies", "tests", "scripts",
        "benchmarks", "examples", "bench.py", "__graft_entry__.py",
    ]
    all_findings = []
    for path in iter_py_files(roots):
        all_findings.extend(check_file(path))
    for path, line, msg in all_findings:
        print(f"{path}:{line}: {msg}")
    if all_findings:
        print(f"{len(all_findings)} finding(s)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
