"""Device-mesh construction.

The reference is single-GPU with no distributed anything (SURVEY.md §2.D);
scale-out here is new design: a named mesh with axes

- ``data``: frame x camera batches (over hosts via DCN + chips via ICI) —
  the natural parallel axis (the reference already renders all C views per
  frame in one forward, ``scripts/utils/evaluate_model.py:98-107``);
- ``tile`` (optional second axis): pixel tiles / Gaussian chunks inside the
  rasterizer for spatial sharding of very large renders.

Collectives are XLA-inserted (psum for loss/grad reduction, all_gather for
tile reassembly), riding ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """Create a mesh over the available devices.

    ``make_mesh()`` → 1D ``data`` mesh over all devices.
    ``make_mesh((4, 2), ("data", "tile"))`` → 2D mesh.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_shapes is None:
        axis_shapes = (n,)
    assert int(np.prod(axis_shapes)) == n, (
        f"mesh {axis_shapes} needs {np.prod(axis_shapes)} devices, have {n}"
    )
    dev_array = np.asarray(devices).reshape(axis_shapes)
    return Mesh(dev_array, axis_names)
