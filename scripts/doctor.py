"""Environment check-up (the reference's fix_environment.sh analog).

Usage: python scripts/doctor.py

Verifies: imports, JAX backend + device, virtual multi-device CPU support,
the native C++ library build, optional dependencies, and a tiny end-to-end
rasterize forward/backward.
"""

import os
import sys

sys.path.insert(0, ".")


def check(label, fn):
    try:
        detail = fn()
        print(f"[OK  ] {label}" + (f": {detail}" if detail else ""))
        return True
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {label}: {type(e).__name__}: {e}")
        return False


def main():
    ok = True

    def imports():
        import flax, optax, orbax.checkpoint  # noqa: F401
        import pose_splatter_tpu  # noqa: F401
        return f"pose_splatter_tpu {pose_splatter_tpu.__version__}"

    ok &= check("core imports", imports)

    def backend():
        import jax

        d = jax.devices()[0]
        return f"{jax.default_backend()} ({d.device_kind})"

    ok &= check("jax backend", backend)

    def native():
        from pose_splatter_tpu.data import native as n

        assert n.available(), "libfastio.so not built"
        return "libfastio.so"

    check("native fastio (optional)", native)

    for mod, why in [("cv2", "video preprocessing"),
                     ("zarr", "zarr datasets"),
                     ("matplotlib", "plots"),
                     ("sklearn", "embedding PCA/t-SNE"),
                     ("joblib", "parallel preprocessing"),
                     ("rerun", "rerun viewer")]:
        def probe(mod=mod):
            __import__(mod)
            return why

        check(f"optional: {mod}", probe)

    def smoke():
        import jax
        import jax.numpy as jnp

        from pose_splatter_tpu.ops.rasterize import rasterize

        means = jnp.array([[0.0, 0.0, 2.0]])
        quats = jnp.array([[1.0, 0, 0, 0]])
        scales = jnp.full((1, 3), 0.05)

        def loss(o):
            rgb, a = rasterize(means, quats, scales, o,
                               jnp.ones((1, 3)), jnp.eye(4)[None],
                               jnp.array([[[50.0, 0, 16], [0, 50.0, 16],
                                           [0, 0, 1]]]), 32, 32,
                               mode="tiled", tile_shape=(8, 32))
            return rgb.sum()

        g = jax.grad(loss)(jnp.array([0.8]))
        assert float(g[0]) != 0.0
        return "fwd+bwd rasterize"

    ok &= check("rasterizer smoke test", smoke)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
