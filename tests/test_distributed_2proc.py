"""Two-process ``init_distributed`` rendezvous smoke test.

The DCN entry point (`muscle_synergies_tpu.parallel.mesh.init_distributed`,
SURVEY §5 distributed-communication-backend row) is exercised elsewhere
only in degenerate single-process form.  Here two real subprocesses
rendezvous through a localhost coordinator on the CPU backend, assert
the global process/device view, and run one tiny cross-process
reduction — the actual multi-host code path, no TPU pod required.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys

import jax
import numpy as np

port, pid = sys.argv[1], int(sys.argv[2])

from muscle_synergies_tpu.parallel import init_distributed, make_mesh

n = init_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=pid,
)
assert n == 2, f"process_count {n} != 2"
assert jax.process_count() == 2
assert jax.process_index() == pid
devs = jax.devices()
assert len(devs) == 2, f"global device count {len(devs)} != 2"

# one tiny psum across processes: each contributes (process_id + 1),
# the jitted sum all-reduces to 3 on both hosts
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh((2, 1))
local = np.array([float(pid + 1)])
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (2,)
)
total = jax.jit(
    jnp.sum, out_shardings=NamedSharding(mesh, P())
)(arr)
assert float(total) == 3.0, float(total)
print(f"WORKER_{pid}_OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_rendezvous_and_psum():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # one CPU device per process: drop any virtual-device inflation the
    # surrounding test session configured
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for pid, proc in enumerate(procs):
            out, err = proc.communicate(timeout=180)
            outs.append((pid, proc.returncode, out, err))
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
    for pid, rc, out, err in outs:
        assert rc == 0, f"worker {pid} failed:\n{err[-2000:]}"
        assert f"WORKER_{pid}_OK" in out
