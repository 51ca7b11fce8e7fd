"""Benchmark: forward+backward rasterizer throughput on one chip.

Workload: the a6000_2d-equivalent render shape (576x512, BASELINE.md) with
16000 Gaussians (the reference's max_n clamp, src/model.py:32-33), 3D mode,
tiled rasterizer, value+grad through every Gaussian parameter.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the reference's published per-batch
renderer speed on the same 576x512 config — ~8 s/batch for its 2D renderer
(docs/reports/CONFIGURATION_GUIDE.md:78; the CUDA gsplat path has no
published per-frame figure) → 0.295 Mpix / 8 s ≈ 0.0369 Mpix/s.
"""

import json
import sys
import time

import numpy as np

BASELINE_MPIX_S = 0.0369
H, W = 512, 576
N = 16000


def main():
    import jax
    import jax.numpy as jnp

    from pose_splatter_tpu.ops.rasterize import rasterize

    rng = np.random.default_rng(0)
    # Mouse-like cluster: Gaussians concentrated in the central third.
    means = np.concatenate(
        [rng.normal(0, 0.06, (N, 2)), rng.normal(2.0, 0.06, (N, 1))], axis=1
    )
    quats = rng.normal(size=(N, 4))
    scales = np.exp(rng.normal(-5.0, 0.3, (N, 3)))
    opac = rng.uniform(0.3, 0.95, N)
    colors = rng.uniform(0, 1, (N, 3))
    f = 900.0
    K = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    view = np.eye(4, dtype=np.float32)[None]

    args = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (means, quats, scales, opac, colors, view, K)
    )

    mode = "pallas" if jax.default_backend() == "tpu" else "tiled"

    def loss(means, quats, scales, opac, colors, view, K):
        rgb, alpha = rasterize(
            means, quats, scales, opac, colors, view, K, W, H,
            backgrounds=jnp.ones(3), mode=mode,
        )
        return (rgb**2).sum() + (alpha**2).sum()

    fwd_bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    # Warmup / compile (np.asarray forces a device→host sync; through the
    # remote-TPU relay block_until_ready alone does not).
    g = fwd_bwd(*args)
    np.asarray(g[0])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        g = fwd_bwd(*args)
    np.asarray(g[0])
    elapsed = time.perf_counter() - t0

    mpix_s = H * W * iters / elapsed / 1e6
    print(
        f"fwd+bwd rasterize: {elapsed/iters*1e3:.2f} ms/frame on "
        f"{jax.devices()[0].platform}", file=sys.stderr,
    )
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_throughput",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
