"""Benchmark: forward+backward rasterizer throughput on one chip.

Workload: the a6000_2d-equivalent render shape (576x512, BASELINE.md) with
16000 Gaussians (the reference's max_n clamp, src/model.py:32-33), value+grad
through every Gaussian parameter.

Default (``--mode 3d``, what the driver runs): 3D conic mode. ``--mode 2d``
measures the production 2D Gaussian-splatting mode (ellipse kernels in pixel
space, input-order compositing — the reference's north-star renderer,
src/gaussian_renderer.py:269-427). ``--batch N`` renders N frames per
dispatch (vmap) to amortize the host→device dispatch floor (~1-2 ms/call
through the relay, docs/PERF_r03.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"baseline"}. ``vs_baseline`` is measured against the reference's ONLY
published per-batch renderer figure on the same 576x512 config — ~8 s/batch
for its torch 2D renderer (docs/reports/CONFIGURATION_GUIDE.md:78) →
0.295 Mpix / 8 s ≈ 0.0369 Mpix/s. The reference's production 3D path
(gsplat CUDA) publishes no per-frame figure, so the ``baseline`` field
names the comparator explicitly: a large ``vs_baseline`` is a statement
about the reference's pathological torch 2D renderer, NOT about the
CUDA-class competition.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax

BASELINE_MPIX_S = 0.0369
H, W = 512, 576
N = 16000


def _bench(fwd_bwd, args, iters=30, reps=4):
    # Warmup / compile (np.asarray forces a device→host sync; through the
    # remote-TPU relay block_until_ready alone does not). Steady-state
    # throughput = best of `reps` timed batches: the relay adds ~ms-scale
    # jitter spikes that a single batch can absorb entirely.
    g = fwd_bwd(*args)
    np.asarray(jax.tree_util.tree_leaves(g)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            g = fwd_bwd(*args)
        np.asarray(jax.tree_util.tree_leaves(g)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_3d(batch):
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
    K = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]] * batch,
                 np.float32)
    view = np.stack([np.eye(4, dtype=np.float32)] * batch)

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
    return _bench(fwd_bwd, args), "rasterize_fwd_bwd_throughput"


def run_2d(batch):
    """2D GS mode: per-frame 9-param Gaussians (the model emits a fresh
    Gaussian set per frame, so the 2D batch vmaps over per-frame params)."""
    import jax.numpy as jnp

    from pose_splatter_tpu.ops.rasterize import rasterize_2d

    rng = np.random.default_rng(0)
    means2d = np.stack([
        np.stack([rng.uniform(0.2 * W, 0.8 * W, N),
                  rng.uniform(0.2 * H, 0.8 * H, N)], 1)
        for _ in range(batch)])
    scales2d = np.exp(rng.normal(0.7, 0.3, (batch, N, 2)))  # ~2 px sigmas
    rot = rng.uniform(0, np.pi, (batch, N))
    opac = rng.uniform(0.3, 0.95, (batch, N))
    colors = rng.uniform(0, 1, (batch, N, 3))

    args = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (means2d, scales2d, rot, opac, colors)
    )

    mode = "pallas" if jax.default_backend() == "tpu" else "tiled"

    def loss(means2d, scales2d, rot, opac, colors):
        def one(m, s, r, o, c):
            rgb, alpha = rasterize_2d(
                m, s, r, o, c, W, H, background=jnp.ones(3), mode=mode,
            )
            return (rgb**2).sum() + (alpha**2).sum()

        return jax.vmap(one)(means2d, scales2d, rot, opac, colors).sum()

    fwd_bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    return _bench(fwd_bwd, args), "rasterize2d_fwd_bwd_throughput"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="3d", choices=["2d", "3d"])
    ap.add_argument("--batch", type=int, default=1,
                    help="frames per dispatch (amortizes the relay floor)")
    cli = ap.parse_args()

    per_dispatch = run_2d(cli.batch) if cli.mode == "2d" else run_3d(cli.batch)
    elapsed, metric = per_dispatch

    mpix_s = H * W * cli.batch / elapsed / 1e6
    print(
        f"fwd+bwd rasterize[{cli.mode}, batch={cli.batch}]: "
        f"{elapsed * 1e3:.2f} ms/dispatch "
        f"({elapsed / cli.batch * 1e3:.2f} ms/frame) on "
        f"{jax.devices()[0].platform}", file=sys.stderr,
    )
    print(json.dumps({
        "metric": metric,
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
        "baseline": (
            "reference torch 2D renderer, 0.0369 Mpix/s "
            "(CONFIGURATION_GUIDE.md:78); its gsplat CUDA path publishes "
            "no per-frame figure"
        ),
    }))


if __name__ == "__main__":
    main()
