"""pose_splatter_tpu — a TPU-native (JAX/XLA/Pallas) Gaussian-splatting framework.

A from-scratch re-design of the Pose Splatter pipeline (feed-forward 3D
Gaussian splatting for animal pose/appearance; reference:
kafkapple/pose-splatter) built TPU-first:

- ``ops``      — compute kernels: differentiable Gaussian rasterization
                 (3D perspective + 2D image-space modes), shape carving,
                 visibility via segment-min, SSIM. Pure-JAX reference paths
                 plus Pallas TPU kernels for the hot tiles.
- ``models``   — Flax modules: 3D U-Net stack, per-voxel Gaussian head, and
                 the end-to-end ``PoseSplatter`` model.
- ``parallel`` — device-mesh construction and sharded train/eval steps
                 (data parallel over frame x camera batches, tile sharding
                 inside the rasterizer, psum gradient reduction).
- ``train``    — losses, jitted train step, checkpointing, evaluation.
- ``data``     — frame datasets (HDF5/Zarr), host-side loading.
- ``preprocess``— camera conversion, up-direction, center/rotation tracking,
                 crop indices, image writing, visual features/embedding.
- ``viz``      — export (npz/PLY/JSON) and rendering utilities.

Everything under ``jit`` uses static shapes; variable-size sets (occupied
voxels, per-tile Gaussian lists) are fixed-capacity with validity masks.
"""

__version__ = "0.1.0"

from pose_splatter_tpu.config import Config  # noqa: F401
