from tpustereo.eval.metrics import (ate, bad, d1_all, end_point_error,  # noqa: F401
                                    kitti_segment_errors, rpe)
