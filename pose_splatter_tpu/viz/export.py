"""Gaussian export: npz / extended-PLY / JSON / point-cloud PLY.

Format parity with the reference exporters
(``/root/reference/scripts/visualization/export_gaussian_full.py:163-271``,
``export_point_cloud.py``): the on-disk contracts (npz keys, extended-PLY
property layout with mm-int scales and int16 quats, sampled JSON) are kept
so external viewers (Rerun/Blender importers) keep working.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def extract_world_gaussians(model, variables, mask, img, p_3d, angle,
                            center_means: bool = True) -> Dict[str, np.ndarray]:
    """Run carve → U-Nets → Gaussian head for one frame; return world-space
    Gaussian parameters as numpy (valid slots only)."""
    from pose_splatter_tpu.utils.geometry import yaw_rotation

    @jax.jit
    def run(variables, mask, img, p_3d, angle):
        volume = model.carve(mask, img, p_3d, angle)
        volume = jnp.transpose(volume, (1, 2, 3, 0))[None]
        vol_flat = model.net.apply(variables, volume, False,
                                   method="process_volume")
        g = model.gaussians_from_volume(variables, vol_flat, train=False)
        means = g["means"] @ yaw_rotation(angle).T + p_3d
        return (means, g["quats"], jnp.exp(g["log_scales"]),
                jax.nn.sigmoid(g["logit_opacities"]), g["colors"], g["valid"])

    means, quats, scales, opac, colors, valid = run(
        variables, jnp.asarray(mask), jnp.asarray(img),
        jnp.asarray(p_3d), jnp.float32(angle),
    )
    keep = np.asarray(valid)
    out = dict(
        means=np.asarray(means)[keep],
        quaternions=np.asarray(quats)[keep],
        scales=np.asarray(scales)[keep],
        opacities=np.asarray(opac)[keep],
        colors=np.asarray(colors)[keep],
    )
    center = out["means"].mean(axis=0, keepdims=True)
    if center_means:
        out["means"] = out["means"] - center
    out["center"] = center
    return out


def save_npz(g: Dict[str, np.ndarray], filename: str) -> str:
    np.savez_compressed(
        filename,
        means=g["means"],
        quaternions=g["quaternions"],
        scales=g["scales"],
        opacities=g["opacities"],
        colors=g["colors"],
        center=g["center"],
        metadata={
            "format": "gaussian_splatting_full",
            "num_gaussians": len(g["means"]),
            "version": "1.0",
        },
    )
    return filename


def save_ply_extended(g: Dict[str, np.ndarray], filename: str) -> str:
    """Extended PLY: float xyz, uchar rgba, int16 quats, mm-int scales."""
    means = g["means"]
    colors = np.clip(g["colors"], 0, 1)
    colors_u8 = (colors * 255).astype(np.uint8)
    opac_u8 = (np.asarray(g["opacities"]) * 255).astype(np.uint8).reshape(-1)
    scales_mm = (g["scales"] * 1000).astype(np.int32)
    quats_i16 = (g["quaternions"] * 32767).astype(np.int16)

    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write("comment Gaussian Splatting Extended Format\n")
        f.write(f"element vertex {len(means)}\n")
        for p in ("x", "y", "z"):
            f.write(f"property float {p}\n")
        for p in ("red", "green", "blue", "alpha"):
            f.write(f"property uchar {p}\n")
        for p in ("quat_w", "quat_x", "quat_y", "quat_z"):
            f.write(f"property short {p}\n")
        for p in ("scale_x", "scale_y", "scale_z"):
            f.write(f"property int {p}\n")
        f.write("end_header\n")
        for i in range(len(means)):
            f.write(f"{means[i,0]} {means[i,1]} {means[i,2]} ")
            f.write(f"{colors_u8[i,0]} {colors_u8[i,1]} {colors_u8[i,2]} {opac_u8[i]} ")
            f.write(f"{quats_i16[i,0]} {quats_i16[i,1]} {quats_i16[i,2]} {quats_i16[i,3]} ")
            f.write(f"{scales_mm[i,0]} {scales_mm[i,1]} {scales_mm[i,2]}\n")
    return filename


def save_ply_pointcloud(g: Dict[str, np.ndarray], filename: str) -> str:
    """Plain colored point cloud (export_point_cloud.py contract)."""
    means = g["means"]
    colors_u8 = (np.clip(g["colors"], 0, 1) * 255).astype(np.uint8)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(means)}\n")
        for p in ("x", "y", "z"):
            f.write(f"property float {p}\n")
        for p in ("red", "green", "blue"):
            f.write(f"property uchar {p}\n")
        f.write("end_header\n")
        for i in range(len(means)):
            f.write(f"{means[i,0]} {means[i,1]} {means[i,2]} ")
            f.write(f"{colors_u8[i,0]} {colors_u8[i,1]} {colors_u8[i,2]}\n")
    return filename


def save_json(g: Dict[str, np.ndarray], filename: str,
              max_gaussians: int = 100) -> str:
    """Sampled JSON for inspection (first ``max_gaussians`` evenly spaced)."""
    means = g["means"]
    n = min(max_gaussians, len(means))
    idx = np.linspace(0, len(means) - 1, n, dtype=int)
    data = {
        "metadata": {
            "format": "gaussian_splatting_full",
            "num_gaussians": len(means),
            "version": "1.0",
        },
        "center": np.asarray(g["center"]).tolist(),
        "gaussians": [
            {
                "position": means[i].tolist(),
                "quaternion": g["quaternions"][i].tolist(),
                "scale": g["scales"][i].tolist(),
                "opacity": float(g["opacities"][i]),
                "color": g["colors"][i].tolist(),
            }
            for i in idx
        ],
    }
    with open(filename, "w") as f:
        json.dump(data, f, indent=2)
    return filename


def export_animation_sequence(model, variables, dataset, frame_range,
                              output_dir: str, format_type: str = "npz",
                              progress: bool = True):
    """Multi-frame export loop (export_animation_sequence.py contract)."""
    os.makedirs(output_dir, exist_ok=True)
    savers = {"npz": save_npz, "ply_extended": save_ply_extended,
              "json": save_json, "ply": save_ply_pointcloud}
    saver = savers[format_type]
    ext = {"npz": "npz", "ply_extended": "ply", "json": "json", "ply": "ply"}
    paths = []
    for frame in frame_range:
        mask, img, p_3d, angle, _ = dataset.get(frame, view_idx=0)
        g = extract_world_gaussians(model, variables, mask, img, p_3d, angle)
        fn = os.path.join(output_dir,
                          f"gaussian_frame{frame:04d}.{ext[format_type]}")
        paths.append(saver(g, fn))
        if progress and (frame + 1) % 50 == 0:
            print(f"  exported frame {frame}")
    return paths
