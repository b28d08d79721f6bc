"""Batch data-parallelism (SURVEY.md §3 #15, §4.2): shard the frame-pair
batch over the mesh 'data' axis with pjit. No collectives during compute —
each chip runs the full single-pair program on its local pairs; only metric
reductions (host-side or psum) cross chips.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpustereo.config import Config
from tpustereo.pipeline import sgbm_batched


def sgbm_data_parallel(left, right, cfg: Config, mesh: Mesh):
    """(B, H, W) uint8 ×2 -> (B, H, W) float32, batch sharded over 'data'.

    B must be divisible by the 'data' axis size. Inputs are placed with
    their target sharding first so pjit inserts no reshard collectives.
    """
    spec = P("data", None, None)
    sharding = NamedSharding(mesh, spec)
    left = jax.device_put(left, sharding)
    right = jax.device_put(right, sharding)
    fn = jax.jit(partial(sgbm_batched.__wrapped__, cfg=cfg),
                 in_shardings=(sharding, sharding),
                 out_shardings=sharding)
    return fn(left, right)
