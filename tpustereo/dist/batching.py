"""Batch data-parallelism (SURVEY.md §3 #15, §4.2): shard the frame-pair
batch over the mesh 'data' axis with pjit. No collectives during compute —
each chip runs the full single-pair program on its local pairs; only metric
reductions (host-side or psum) cross chips.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpustereo.config import Config
from tpustereo.pipeline import sgbm_batched


def sgbm_data_parallel_fn(cfg: Config, mesh: Mesh):
    """The jitted (B, H, W) ×2 -> (B, H, W) data-parallel step.

    shard_map, NOT bare pjit: the per-chip batch loop is a `lax.scan`, and
    SPMD cannot partition a scan whose length is the global batch — under
    pjit every chip would run every pair. Inside shard_map each chip scans
    only its local B/n pairs at full single-pair speed; there are no
    collectives during compute (SURVEY.md §4.2).
    """
    spec = P("data", None, None)
    body = shard_map(partial(sgbm_batched.__wrapped__, cfg=cfg), mesh=mesh,
                     in_specs=(spec, spec), out_specs=spec, check_vma=False)
    sharding = NamedSharding(mesh, spec)
    return jax.jit(body, in_shardings=(sharding, sharding),
                   out_shardings=sharding), sharding


def sgbm_data_parallel(left, right, cfg: Config, mesh: Mesh):
    """(B, H, W) uint8 ×2 -> (B, H, W) float32, batch sharded over 'data'.
    B must be divisible by the 'data' axis size."""
    fn, sharding = sgbm_data_parallel_fn(cfg, mesh)
    left = jax.device_put(left, sharding)
    right = jax.device_put(right, sharding)
    return fn(left, right)
