from pose_splatter_tpu.preprocess.cameras import convert_camera_params  # noqa: F401
from pose_splatter_tpu.preprocess.up_direction import (  # noqa: F401
    auto_estimate_up,
    up_from_vertical_lines,
)
