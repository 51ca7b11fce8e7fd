from pose_splatter_tpu.utils import cameras, geometry  # noqa: F401
