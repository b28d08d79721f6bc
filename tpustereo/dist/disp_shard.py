"""Disparity-axis tensor parallelism (SURVEY.md §3 #17, optional tier).

Shards the D axis of the cost volume across chips: each chip builds and
searches its own disparity slice, then one `pmin` over the packed
(cost*256 + d) scalar field resolves the global winner — ties break toward
the smallest d exactly like the single-chip argmin. Applies to the
WTA-on-raw-cost modes (census_wta, sad): SGM aggregation couples every d
through the min_k L(p-r, k) renormalisation and the d±1 penalties, so its
D axis does not decompose across chips (use strip tiling for that — §4.3).

Useful when D or resolution outgrows a single chip's HBM; also the pattern
reference for any future D-sharded cost stage.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpustereo.config import Config
from tpustereo.ops import census, cost_volume, sad_volume

AXIS = "strip"  # reuse the intra-host mesh axis; D slices ride ICI


def _wta_disp_sharded(left, right, cfg: Config):
    """Per-chip: build the local D-slice of the volume, pack, pmin."""
    n = lax.axis_size(AXIS)
    i = lax.axis_index(AXIS)
    D = cfg.num_disparities
    Dl = D // n
    d0 = cfg.min_disparity + i * Dl

    if cfg.mode == "sad":
        # SAD runs at Tsukuba scale; full-volume-then-slice keeps it simple
        vol = lax.dynamic_slice_in_dim(
            sad_volume(left, right, D, cfg.sad_block,
                       d_start=cfg.min_disparity), i * Dl, Dl,
            axis=2).astype(jnp.int32)
    else:
        cl = census(left, cfg.census_window)
        cr = census(right, cfg.census_window)
        vol = cost_volume(cl, cr, Dl, cfg.max_census_cost,
                          d_start=d0).astype(jnp.int32)

    from tpustereo.ops.wta import next_pow2
    shift = next_pow2(max(D, 2))  # scales with D; a fixed 256 capped D at 256
    jj = i * Dl + jnp.arange(Dl)[None, None, :]   # global plane index
    packed = vol * shift + jj
    local = jnp.min(packed, axis=-1)
    best = lax.pmin(local, AXIS)
    d_int = (best & (shift - 1)) + cfg.min_disparity
    return d_int.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def wta_disparity_sharded(left, right, cfg: Config, mesh: Mesh):
    """(H, W) uint8 ×2 -> (H, W) float32 integer disparity, with the
    disparity axis sharded over the mesh 'strip' axis. Raw WTA (no
    uniqueness/subpixel/postproc) — the memory-bound inner search."""
    assert cfg.mode in ("sad", "census_wta"), "SGM couples D; see docstring"
    n = mesh.shape[AXIS]
    assert cfg.num_disparities % n == 0
    fn = shard_map(partial(_wta_disp_sharded, cfg=cfg), mesh=mesh,
                   in_specs=(P(), P()), out_specs=P())
    return fn(left, right)
