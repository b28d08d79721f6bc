"""Multi-host bootstrap test (SURVEY.md §5.0/§5.8): two local processes
form a jax.distributed cluster over the loopback DCN and run a psum —
validating `dist.init_distributed` and the collective path without a pod."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
from tpustereo.dist import init_distributed
init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=2,
                 process_id=pid)
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
x = jnp.ones((1, 4)) * (pid + 1)
out = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
print("RESULT", float(out[0, 0]), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    # no pytest-timeout on this box; communicate(timeout=220) is the guard
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one device per process
    # the axon sitecustomize registers (and initialises) the tunnelled TPU
    # backend at interpreter start, which forbids jax.distributed.initialize
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=220)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "RESULT 3.0" in out, (out, err[-2000:])
