from tpustereo.ops.census import census, cost_volume  # noqa: F401
from tpustereo.ops.sad import sad_volume  # noqa: F401
from tpustereo.ops.sgm import aggregate, aggregate_path  # noqa: F401
from tpustereo.ops.wta import wta  # noqa: F401
from tpustereo.ops.postproc import (lr_check, speckle, median3,  # noqa: F401
                                    fill_background, fill_hirschmuller,
                                    lr_hits, lr_hits_from_volume,
                                    speckle_frames, speckle_labels)
