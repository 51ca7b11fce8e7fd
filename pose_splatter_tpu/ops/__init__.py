from pose_splatter_tpu.ops.carving import carve_volume  # noqa: F401
from pose_splatter_tpu.ops.projection import project_gaussians  # noqa: F401
from pose_splatter_tpu.ops.rasterize import rasterize, rasterize_2d  # noqa: F401
from pose_splatter_tpu.ops.ssim import ssim  # noqa: F401
