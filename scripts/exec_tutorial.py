#!/usr/bin/env python
"""Execute docs/tutorial.ipynb end-to-end (executable-docs gate).

The reference's tutorials are its only executable documentation and
nothing runs them (SURVEY §4); here the notebook executes in CI via
nbclient so the docs cannot silently rot.  Exit 0 = every code cell
ran.

Usage: python scripts/exec_tutorial.py [notebook.ipynb]
"""

import os
import sys

import nbformat
from nbclient import NotebookClient

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv) -> int:
    path = argv[0] if argv else os.path.join(HERE, "docs", "tutorial.ipynb")
    nb = nbformat.read(path, as_version=4)
    # Platform-parameter cell: in sandboxes where a sitecustomize PJRT
    # plugin overrides JAX_PLATFORMS (this one preloads a remote-TPU
    # relay), the env var alone cannot select the CPU backend — it must
    # be forced through jax.config before any device query.
    platform = os.environ.get("TUTORIAL_FORCE_PLATFORM")
    if platform:
        nb.cells.insert(
            0,
            nbformat.v4.new_code_cell(
                "import jax\n"
                f"jax.config.update('jax_platforms', {platform!r})\n"
            ),
        )
    client = NotebookClient(
        nb,
        timeout=900,
        kernel_name="python3",
        resources={"metadata": {"path": HERE}},
    )
    client.execute()
    n_code = sum(1 for c in nb.cells if c.cell_type == "code")
    print(f"executed {n_code} code cells of {os.path.basename(path)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
