#!/usr/bin/env python
"""Regenerate docs/tutorial.ipynb from docs/tutorial.md.

Markdown prose becomes markdown cells; fenced ```python blocks become
code cells.  Keeps the notebook in lockstep with the canonical
markdown tutorial:

    python scripts/gen_tutorial_nb.py
"""

import os
import re

import nbformat

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MD = os.path.join(HERE, "docs", "tutorial.md")
NB = os.path.join(HERE, "docs", "tutorial.ipynb")


def main() -> None:
    text = open(MD).read()
    parts = re.split(r"```python\n(.*?)```\n?", text, flags=re.S)
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    for i, part in enumerate(parts):
        part = part.strip("\n")
        if not part.strip():
            continue
        if i % 2 == 0:
            nb.cells.append(nbformat.v4.new_markdown_cell(part))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(part))
    nbformat.validate(nb)
    with open(NB, "w") as f:
        nbformat.write(nb, f)
    print(f"wrote {NB}: {len(nb.cells)} cells")


if __name__ == "__main__":
    main()
