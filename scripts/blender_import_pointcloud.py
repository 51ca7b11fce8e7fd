"""Blender importer for exported Gaussian point clouds (run inside Blender).

Usage (inside Blender's scripting tab or CLI):
    blender --background --python scripts/blender_import_pointcloud.py -- \
        /path/to/gaussian_frame0000.npz [--radius 0.002]

Covers the reference's ``scripts/visualization/blender_import_pointcloud.py``
contract: reads the npz export (``viz/export.py`` format: means /
quaternions / scales / opacities / colors), builds a point-cloud mesh with
per-vertex colors, and attaches a geometry-nodes-free material that renders
the vertices as small spheres via instancing.
"""

import sys


def _parse_args():
    argv = sys.argv
    if "--" in argv:
        argv = argv[argv.index("--") + 1 :]
    path = argv[0] if argv else None
    radius = 0.002
    if "--radius" in argv:
        radius = float(argv[argv.index("--radius") + 1])
    return path, radius


def import_npz(path, radius=0.002):
    import bpy
    import numpy as np

    d = np.load(path, allow_pickle=True)
    means = d["means"]
    colors = np.clip(d["colors"], 0, 1)

    mesh = bpy.data.meshes.new("gaussians")
    mesh.from_pydata([tuple(p) for p in means], [], [])
    mesh.update()

    attr = mesh.color_attributes.new(name="Col", type="FLOAT_COLOR",
                                     domain="POINT")
    for i, c in enumerate(colors):
        attr.data[i].color = (float(c[0]), float(c[1]), float(c[2]), 1.0)

    obj = bpy.data.objects.new("gaussians", mesh)
    bpy.context.collection.objects.link(obj)

    # Instance small spheres on the vertices.
    bpy.ops.mesh.primitive_uv_sphere_add(radius=radius)
    sphere = bpy.context.object
    sphere.name = "gaussian_instance"
    sphere.parent = obj
    obj.instance_type = "VERTS"

    mat = bpy.data.materials.new("gaussian_mat")
    mat.use_nodes = True
    bsdf = mat.node_tree.nodes["Principled BSDF"]
    vc = mat.node_tree.nodes.new("ShaderNodeVertexColor")
    vc.layer_name = "Col"
    mat.node_tree.links.new(vc.outputs["Color"], bsdf.inputs["Base Color"])
    sphere.data.materials.append(mat)

    print(f"Imported {len(means)} Gaussians from {path}")
    return obj


if __name__ == "__main__":
    path, radius = _parse_args()
    if path is None:
        print(__doc__)
        sys.exit(1)
    import_npz(path, radius)
