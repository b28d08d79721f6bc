"""Golden reference implementations (the parity oracle chain).

The reference checkout (hilbertw/stereo_matching) is empty (SURVEY.md §0), so
parity is defined against this three-level oracle chain instead:

1. `sgbm_numpy` — loop/NumPy implementation of the exact recurrences in
   SURVEY.md §1.1; auditable against the equations; the JAX pipeline must be
   bit-exact against it on the integer stages.
2. `opencv_ref` — cv2.StereoSGBM / cv2.StereoBM adapters; parity at the
   disparity-map / metric level (different cost function: BT vs census).
3. Synthetic pairs with analytic ground truth (`tpustereo.data.synthetic`).
"""

from tpustereo.golden.sgbm_numpy import (  # noqa: F401
    INVALID,
    census_numpy,
    cost_volume_numpy,
    sad_volume_numpy,
    aggregate_numpy,
    aggregate_path_numpy,
    wta_numpy,
    lr_check_numpy,
    speckle_numpy,
    median3_numpy,
    sgbm_numpy,
)
