"""Pallas TPU kernels for the hot ops (SURVEY.md §3 #3-6, §7 step 4).

These are the TPU-native equivalents of the reference family's C++ CPU
kernels: compiled by Mosaic to TPU machine code, with the pure-jnp modules
in `tpustereo.ops` as always-correct fallbacks and parity targets. Kernel
selection is driven by `Config.backend` ('auto' picks Pallas on TPU).
"""

from tpustereo.kernels.sgm_pallas import (  # noqa: F401
    aggregate_pallas,
    bwd_wta_feasible,
    sgm_select_pallas,
    sgm_sweep,
    sweep_bwd_wta,
)
from tpustereo.kernels.wta_pallas import wta_lr_pallas  # noqa: F401
from tpustereo.kernels.sad_pallas import (  # noqa: F401
    sad_fused_feasible,
    sad_wta_pallas,
)
from tpustereo.kernels.bitonic_pallas import (  # noqa: F401
    bitonic_feasible,
    bitonic_sort_pallas,
)
from tpustereo.kernels.lr_pallas import dr_consistency_pallas  # noqa: F401
from tpustereo.kernels.cost_pallas import census_cost_volume_pallas  # noqa: F401
from tpustereo.kernels.cc_pallas import connected_component_labels_pallas  # noqa: F401
from tpustereo.kernels.median_pallas import median3_pallas  # noqa: F401
from tpustereo.kernels.transpose_pallas import transpose_hw_pallas  # noqa: F401
