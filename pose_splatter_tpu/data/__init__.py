from pose_splatter_tpu.data.dataset import FrameDataset, FrameLoader  # noqa: F401
