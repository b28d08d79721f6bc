"""Multi-host benchmark + scaling-efficiency harness (SURVEY.md §5.0/§5.8;
the ≥80 %-at-2-hosts target of BASELINE.json:5).

`run_multihost_bench(n)` spawns n worker processes that form a
`jax.distributed` cluster over loopback DCN — byte-for-byte the real pod
bootstrap; on hardware the same worker runs once per host with the right
coordinator address — then times the data-parallel batched pipeline inside
ONE XLA program per host (`_timed_device_loop`, so neither dispatch nor DCN
latency between steps pollutes the number) at a fixed per-device batch, and
reports throughput and scaling efficiency vs the single-process baseline:

    efficiency = fps_total(n) / (n * fps_total(1))   [= sec_1 / sec_n here]

On this CPU-only dev box the harness validates the full path end-to-end
(workers are forced onto the CPU backend unless TPUSTEREO_MH_REAL=1); on a
real 2-host slice the judged number is one command:

    python -m tpustereo.cli bench --multihost 2
"""

from __future__ import annotations

import dataclasses
import json
import os
import socket
import subprocess
import sys
from typing import Optional, Tuple

from tpustereo.config import Config

_OK_TAG = "MHRESULT "


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env() -> dict:
    """Worker environment: drop the axon sitecustomize (it force-registers
    the tunnelled single-chip TPU backend, which forbids
    jax.distributed.initialize) unless a real multi-host TPU is declared."""
    env = dict(os.environ)
    if os.environ.get("TPUSTEREO_MH_REAL"):
        return env
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    env["TPUSTEREO_MH_CPU"] = "1"
    return env


def _launch(n: int, cfg: Config, shape, batch: int, iters: int,
            timeout: float) -> dict:
    port = _free_port()
    env = _clean_env()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    payload = json.dumps(dict(cfg=dataclasses.asdict(cfg), shape=list(shape),
                              batch=batch, iters=iters))
    procs = [subprocess.Popen(
        [sys.executable, "-m", "tpustereo.eval.multihost",
         str(pid), str(n), str(port), payload],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=repo) for pid in range(n)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        if rc != 0:
            raise RuntimeError(f"multihost worker failed rc={rc}:\n"
                               f"{out}\n{err[-3000:]}")
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith(_OK_TAG):
                return json.loads(line[len(_OK_TAG):])
    raise RuntimeError(f"no result line from workers: {outs[0][1]!r}")


def run_multihost_bench(num_processes: int = 2, cfg: Optional[Config] = None,
                        shape: Tuple[int, int] = (375, 1242), batch: int = 1,
                        iters: int = 5, timeout: float = 600.0) -> dict:
    """Spawn the cluster twice (1 process, then n) and report scaling."""
    cfg = cfg or Config()
    base = _launch(1, cfg, shape, batch, iters, timeout)
    multi = _launch(num_processes, cfg, shape, batch, iters, timeout)
    eff = (multi["fps_total"] / (num_processes * base["fps_total"])
           if base["fps_total"] > 0 else 0.0)
    return {
        "metric": f"multihost scaling efficiency at {num_processes} hosts",
        "value": round(eff, 4),
        "unit": "fraction",
        "hosts": num_processes,
        "fps_total_1host": base["fps_total"],
        "fps_total_nhost": multi["fps_total"],
        "fps_per_host": round(multi["fps_total"] / num_processes, 3),
        "per_device_batch": batch,
        "devices_per_host": multi["local_devices"],
        "backend": multi["backend"],
        "shape": list(shape),
        "config": dataclasses.asdict(cfg),
    }


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------

def _worker(pid: int, n: int, port: int, payload: str) -> None:
    import jax
    if os.environ.get("TPUSTEREO_MH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import tpustereo
    tpustereo.enable_compilation_cache()
    from tpustereo.dist import init_distributed, make_mesh
    init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=n,
                     process_id=pid)

    import numpy as np
    from tpustereo.config import Config
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.dist.batching import sgbm_data_parallel_fn
    from tpustereo.eval.bench import _timed_device_loop

    spec = json.loads(payload)
    cfg = Config.from_dict(spec["cfg"])
    H, W = spec["shape"]
    batch, iters = spec["batch"], spec["iters"]

    n_dev = len(jax.devices())
    B = batch * n_dev  # constant per-device batch => efficiency = sec1/secN
    mesh = make_mesh(data=n_dev, strip=1)
    fn, sharding = sgbm_data_parallel_fn(cfg, mesh)
    L, R, _, _ = synthetic_pair((H, W), disparity=24.0, slope=0.02, seed=0)
    lefts = np.stack([L] * B)
    rights = np.stack([R] * B)
    gl = jax.make_array_from_callback((B, H, W), sharding,
                                      lambda idx: lefts[idx])
    gr = jax.make_array_from_callback((B, H, W), sharding,
                                      lambda idx: rights[idx])
    sec = _timed_device_loop(fn, gl, gr, iters=iters)
    if pid == 0:
        print(_OK_TAG + json.dumps({
            "fps_total": round(B / sec, 3),
            "sec_per_step": sec,
            "local_devices": jax.local_device_count(),
            "processes": jax.process_count(),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
