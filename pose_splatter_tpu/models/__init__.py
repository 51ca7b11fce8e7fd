from pose_splatter_tpu.models.unet3d import Unet3D, init_unet_primary_skip  # noqa: F401
from pose_splatter_tpu.models.pose_splatter import PoseSplatter  # noqa: F401
