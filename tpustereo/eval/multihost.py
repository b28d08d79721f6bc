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


def _clean_env(devices_per_host: int = 1) -> dict:
    """Worker environment: drop the axon sitecustomize (it force-registers
    the tunnelled single-chip TPU backend, which forbids
    jax.distributed.initialize) unless a real multi-host TPU is declared.
    devices_per_host > 1 fakes that many CPU devices per process so the
    tiled (data × strip) composition is exercisable on loopback."""
    env = dict(os.environ)
    if os.environ.get("TPUSTEREO_MH_REAL"):
        return env
    env["JAX_PLATFORMS"] = "cpu"
    if devices_per_host > 1:
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                            f"{devices_per_host}")
    else:
        env.pop("XLA_FLAGS", None)  # one device per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    env["TPUSTEREO_MH_CPU"] = "1"
    return env


def _launch(n: int, cfg: Config, shape, batch: int, iters: int,
            timeout: float, tiled: bool = False,
            devices_per_host: int = 1) -> dict:
    port = _free_port()
    env = _clean_env(devices_per_host if tiled else 1)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    payload = json.dumps(dict(cfg=dataclasses.asdict(cfg), shape=list(shape),
                              batch=batch, iters=iters, tiled=tiled))
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
                        iters: int = 5, timeout: float = 600.0,
                        tiled: bool = False,
                        devices_per_host: int = 2) -> dict:
    """Spawn the cluster twice (1 process, then n) and report scaling.

    tiled=True benches the judged config-5 composition (SURVEY.md §4.2/§4.3;
    BASELINE.json:5,11): mesh = (data=N hosts over DCN, strip=local devices
    over ICI), each pair strip-tiled via `sgbm_tiled_batched`. Efficiency is
    fps_total(n)/(n·fps_total(1)) at constant per-HOST work: the 1-process
    baseline runs the identical per-host mesh (data=1, strip=local), so the
    ratio isolates the DCN cost exactly as in the data-parallel mode.
    devices_per_host only matters on the CPU loopback validation path
    (fakes that many devices per process); real TPU hosts use their chips.
    """
    cfg = cfg or Config()
    base = _launch(1, cfg, shape, batch, iters, timeout, tiled,
                   devices_per_host)
    multi = _launch(num_processes, cfg, shape, batch, iters, timeout, tiled,
                    devices_per_host)
    eff = (multi["fps_total"] / (num_processes * base["fps_total"])
           if base["fps_total"] > 0 else 0.0)
    return {
        "metric": (f"multihost {'tiled ' if tiled else ''}scaling "
                   f"efficiency at {num_processes} hosts"),
        "value": round(eff, 4),
        "unit": "fraction",
        "hosts": num_processes,
        "tiled": tiled,
        "fps_total_1host": base["fps_total"],
        "fps_total_nhost": multi["fps_total"],
        "sec_per_step_1host": base["sec_per_step"],
        "sec_per_step_nhost": multi["sec_per_step"],
        "global_batch_1host": base["global_batch"],
        "global_batch_nhost": multi["global_batch"],
        "fps_per_host": round(multi["fps_total"] / num_processes, 3),
        "per_device_batch": batch,
        "devices_per_host": multi["local_devices"],
        "strips": multi.get("strips", 1),
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
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpustereo.config import Config
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop

    spec = json.loads(payload)
    cfg = Config.from_dict(spec["cfg"])
    H, W = spec["shape"]
    batch, iters = spec["batch"], spec["iters"]
    tiled = spec.get("tiled", False)

    n_dev = len(jax.devices())
    if tiled:
        # judged config-5 composition: batch over hosts (DCN), strips over
        # each host's local devices (ICI) — jax.devices() orders by process,
        # so the (data, strip) reshape puts 'strip' within a host
        strip = jax.local_device_count()
        data = n_dev // strip
        mesh = make_mesh(data=data, strip=strip)
        cfg = cfg.replace(strips=strip)
        B = batch * data  # constant per-HOST batch => efficiency = sec1/secN
        from tpustereo.dist.tiling import sgbm_tiled_batched
        sharding = NamedSharding(mesh, P("data", "strip", None))
        fn = lambda l, r: sgbm_tiled_batched(l, r, cfg, mesh)  # noqa: E731
    else:
        B = batch * n_dev  # constant per-device batch
        mesh = make_mesh(data=n_dev, strip=1)
        from tpustereo.dist.batching import sgbm_data_parallel_fn
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
            "global_batch": B,
            "strips": (mesh.shape["strip"]),
            "local_devices": jax.local_device_count(),
            "processes": jax.process_count(),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
