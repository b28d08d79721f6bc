from tpustereo.dist.mesh import init_distributed, make_mesh  # noqa: F401
from tpustereo.dist.tiling import sgbm_tiled, sgbm_tiled_batched  # noqa: F401
from tpustereo.dist.batching import sgbm_data_parallel  # noqa: F401
from tpustereo.dist.disp_shard import wta_disparity_sharded  # noqa: F401
