"""Repo-root pytest configuration: force the local CPU backend early.

This sandbox presets ``JAX_PLATFORMS=axon`` (a remote-TPU PJRT plugin
loaded from ``sitecustomize`` before any user code), so any pytest
collection that touches jax must override the platform through
``jax.config`` or it initializes the relay — and hangs for ~25 minutes
when the tunnel is down.  ``tests/conftest.py`` already covers the test
suite; this root conftest covers the ``--doctest-modules`` gate
(``make doctest``), whose collection imports the package modules
directly without loading the tests/ conftest.
"""

import jax

jax.config.update("jax_platforms", "cpu")
