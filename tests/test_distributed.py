"""Two-process jax.distributed run of the encrypted-aggregation reduce.

The suite's other parallel tests emulate a mesh with 8 virtual CPU devices
inside one process; this one actually crosses a process boundary — the
DCN-shaped path. It launches two worker processes (2 virtual CPU devices
each), has them form a global 4-device mesh via
parallel.mesh.initialize_distributed, and runs the Montgomery-multiply
ring all-reduce across both, asserting the decrypted sum on each process.
Fails if initialize_distributed (parallel/mesh.py) or the cross-process
collective path breaks.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# Hang guard: the p.communicate(timeout=540) below kills a stuck run —
# no pytest-timeout dependency needed (the plugin isn't installed; its
# mark would be a silent no-op).
def test_two_process_ring_allreduce():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # The workers configure their own platform/device-count flags.
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_PROCESSES")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (i, out)
        assert "DIST_OK" in out, "worker %d missing DIST_OK:\n%s" % (i, out)
