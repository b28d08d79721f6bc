"""Distributed communication backend (SURVEY.md §5.8) — the TPU-native
equivalent of the NCCL/MPI layer a CPU/GPU framework would carry.

Multi-host bootstrap is `jax.distributed.initialize` (DCN); all transport
below that is owned by the XLA TPU runtime. The device mesh has two axes:
`data` (frame-pair batch; maps across hosts / DCN) and `strip` (image rows;
maps within a host's ICI domain so halo/ring collectives ride ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap. No-op on a single process; safe to call twice."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_mesh(data: int = 1, strip: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """2-D device mesh ('data', 'strip').

    `data` spans hosts (DCN-friendly: batch sharding needs no collectives
    during compute); `strip` stays within the ICI domain (halo ppermute).
    Device order: `strip` is the fastest-varying axis so neighbouring strips
    land on ICI-adjacent devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = data * strip
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(data, strip)
    return Mesh(grid, axis_names=("data", "strip"))
