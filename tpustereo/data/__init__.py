from tpustereo.data.synthetic import synthetic_pair  # noqa: F401
from tpustereo.data.io import (  # noqa: F401
    read_image_gray, write_image, read_pfm, write_pfm,
    read_kitti_disparity, write_kitti_disparity,
)
from tpustereo.data.datasets import (  # noqa: F401
    load_middlebury_pair, load_kitti2015_pair, kitti_odometry_sequence,
    KittiCalib,
)
from tpustereo.data.prefetch import prefetch_pairs  # noqa: F401
