from tpustereo.odometry.backend import OdometryConfig, StereoOdometry  # noqa: F401
from tpustereo.odometry.pose_graph import PoseGraph, optimize_poses  # noqa: F401
from tpustereo.odometry.pnp import gauss_newton_pose  # noqa: F401
from tpustereo.odometry.features import (  # noqa: F401
    detect_corners, describe, match_descriptors,
)
from tpustereo.odometry import se3  # noqa: F401
