"""End-to-end quality benchmark on a synthetic multi-view scene.

Usage: python scripts/synthetic_benchmark.py [--steps 300] [--width 288]
       [--height 256] [--grid 64] [--cameras 5] [--mode 3d] [--out report.json]

Builds a textured-ellipsoid "animal" observed by C cameras (one held out),
trains the full pipeline (carve → U-Nets → Gaussians → render → IoU/L1/SSIM
loss) for N steps, and reports PSNR / SSIM / IoU on the HELD-OUT view —
the novel-view-synthesis quality the reference benchmarks (BASELINE.md).
No real dataset is required, so this runs anywhere (TPU or CPU) and gives a
repeatable quality + speed figure.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pose_splatter_tpu.models.pose_splatter import PoseSplatter
from pose_splatter_tpu.models.unet3d import init_unet_primary_skip
from pose_splatter_tpu.ops.ssim import psnr, ssim
from pose_splatter_tpu.train.loop import create_train_state, make_train_step
from pose_splatter_tpu.train.losses import iou_loss
from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical


def make_rig(C, H, W):
    """The benchmark camera rig — the ONE definition shared by the scene
    oracle and :func:`build_model` so they can never desynchronize."""
    f = 1.7 * max(W, H)
    Ks = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]] * C, np.float32)
    Es = np.stack([
        camera_extrinsic_spherical(1.0, np.pi / 2.2 - 0.25 * (i % 2),
                                   2 * np.pi * i / C)
        for i in range(C)
    ]).astype(np.float32)
    return Ks, Es


def make_scene(C, H, W, T=16, seed=0, radii=(0.10, 0.05, 0.04)):
    """Textured ellipsoid with per-frame pose; returns cameras + frames.

    ``radii`` sets the animal size in world units. NOTE the occupied-voxel
    count it implies at the chosen grid: the adaptive threshold loop
    (reference ``model.py:184-204``) degenerates when the strict-threshold
    interior alone exceeds ``max_n`` — every selected voxel then sits at
    probability ``pt`` + one sigmoid step, i.e. opacity ~0.01, and training
    starts alpha-starved (the reference behaves identically; its real mouse
    at grid 128 occupies ~1e4 voxels). Size the animal or ``max_n``
    accordingly.
    """
    rng = np.random.default_rng(seed)
    Ks, Es = make_rig(C, H, W)

    # Ellipsoid point-sample renderer (independent oracle, not our splatter).
    n_pts = 60000
    u = rng.normal(size=(n_pts, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    radii = np.asarray(radii, np.float64)
    pts0 = u * radii
    # Procedural texture: stripes + polka dots.
    tex = 0.5 + 0.4 * np.sin(60 * pts0[:, 0]) * np.cos(40 * pts0[:, 1])
    colors0 = np.stack([
        0.65 * tex + 0.2, 0.35 * tex + 0.15, 0.45 * (1 - tex) + 0.2
    ], 1)

    centers = 0.04 * rng.normal(size=(T, 3))
    centers[:, 2] *= 0.3
    angles = np.linspace(0, 2.2, T) + 0.1 * rng.normal(size=T)

    frames = np.full((T, C, H, W, 3), 255, np.uint8)
    for t in range(T):
        c, s = np.cos(angles[t]), np.sin(angles[t])
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        pts = pts0 @ R.T + centers[t]
        ph = np.concatenate([pts, np.ones((n_pts, 1))], 1)
        for ci in range(C):
            cam = (Es[ci] @ ph.T).T[:, :3]
            pix = (Ks[ci] @ cam.T).T
            z = pix[:, 2]
            x = np.clip(np.round(pix[:, 0] / z), 0, W - 1).astype(int)
            y = np.clip(np.round(pix[:, 1] / z), 0, H - 1).astype(int)
            order = np.argsort(-z)  # far-to-near painter's algorithm
            img = frames[t, ci]
            img[y[order], x[order]] = np.clip(
                colors0[order] * 255, 0, 255).astype(np.uint8)
    return Ks, Es, frames, centers.astype(np.float32), angles.astype(np.float32)


def build_model(C, H, W, grid, mode, crop=None, holdout=None,
                min_n=512, max_n=8192, anchored=False, carve_cap=None,
                ell=0.35, remat_unets=False):
    """The benchmark PoseSplatter config (shared with temporal_benchmark)."""
    if crop:
        v = [int(x) for x in crop.split(",")]
        volume_idx = [[v[0], v[1]], [v[2], v[3]], [v[4], v[5]]]
    else:
        volume_idx = [[0, grid], [0, grid], [0, grid]]
    Ks, Es = make_rig(C, H, W)
    return PoseSplatter(
        Ks, Es,
        W, H, ell=ell, grid_size=grid, volume_idx=volume_idx,
        holdout_views=[C - 1 if holdout is None else holdout],
        gaussian_mode=mode,
        gaussian_config={"view_anchored": True} if anchored else None,
        render_mode="pallas" if jax.default_backend() == "tpu" else "tiled",
        min_n=min_n, max_n=max_n,
        carve_visibility_cap=carve_cap,
        remat_unets=remat_unets,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--width", type=int, default=288)
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--grid", type=int, default=64)
    parser.add_argument("--cameras", type=int, default=5)
    parser.add_argument("--mode", default="3d", choices=["2d", "3d"])
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--crop", default=None,
                        help="volume_idx as x0,x1,y0,y1,z0,z1 (div-16 dims; "
                        "the reference's production configs crop the grid, "
                        "e.g. a6000_2d.json grid 128 -> (96,80,64))")
    parser.add_argument("--radii", default="0.10,0.05,0.04",
                        help="animal ellipsoid radii in world units (see "
                        "make_scene docstring re: max_n)")
    parser.add_argument("--min-n", type=int, default=512)
    parser.add_argument("--max-n", type=int, default=8192)
    parser.add_argument("--anchored", action="store_true",
                        help="2D mode: view-anchored means (framework "
                        "extension; the reference's raw-pixel 2D head is "
                        "view-independent and cannot do multi-view training "
                        "— docs/DESIGN.md §5)")
    parser.add_argument("--remat-unets", action="store_true",
                        help="nn.remat the U-Net stack (recompute in "
                        "backward) — required to fit the grid-256 "
                        "high-res step in 16 GB HBM")
    parser.add_argument("--carve-cap", type=int, default=None,
                        help="carve_visibility_cap (ops/carving.py): static "
                        "occupied-set compaction for the visibility sort; "
                        "overflow counted")
    parser.add_argument("--per-camera", action="store_true",
                        help="also evaluate ALL C views per frame (observed "
                        "included) with per-camera l1/iou/soft_iou/psnr/ssim "
                        "— the reference's metrics_test.csv protocol "
                        "(scripts/utils/evaluate_model.py:152-227)")
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help=">1 chains K train steps in one dispatch "
                        "(lax.scan over device-resident frames) — "
                        "amortizes the ~100-150 ms per-dispatch round "
                        "trip of relay-attached TPUs (train/loop.py "
                        "make_train_multi_step)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--save-state", default=None,
                        help="pickle the trained params/batch_stats here "
                        "(reused by scripts/temporal_benchmark.py)")
    args = parser.parse_args()

    C, H, W = args.cameras, args.height, args.width
    holdout = C - 1
    print(f"Building synthetic scene: {C} cameras (view {holdout} held "
          f"out), {W}x{H}, grid {args.grid}", file=sys.stderr)
    radii = tuple(float(x) for x in args.radii.split(","))
    Ks, Es, frames, centers, angles = make_scene(C, H, W, T=args.frames,
                                                 radii=radii)

    imgs = frames.astype(np.float32) / 255.0
    masks = np.where(imgs[..., 0] == 1.0, 0.0, 1.0).astype(np.float32)
    obs = [i for i in range(C) if i != holdout]

    g = args.grid
    model = build_model(C, H, W, g, args.mode, crop=args.crop,
                        holdout=holdout, anchored=args.anchored,
                        min_n=args.min_n, max_n=args.max_n,
                        carve_cap=args.carve_cap,
                        remat_unets=args.remat_unets)
    tx = optax.adam(args.lr)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    params = init_unet_primary_skip(state.params)
    if args.mode == "2d":
        from pose_splatter_tpu.models.pose_splatter import init_means2d_center

        params = init_means2d_center(params, W, H, anchored=args.anchored)
    state = state._replace(params=params)
    step = make_train_step(model, tx, img_lambda=0.5, ssim_lambda=0.1)

    T = len(frames)
    rng = np.random.default_rng(0)

    # Pre-stage per-FRAME payloads on device once (per-step H2D transfers
    # through the device relay otherwise dominate the step time); the view
    # only changes two scalar index arrays, so views share the frame
    # payload instead of duplicating ~24 MB each.
    frame_payload = [dict(
        mask=jnp.asarray(masks[t][obs])[None],
        img=jnp.asarray(imgs[t][obs])[None],
        p_3d=jnp.asarray(centers[t])[None],
        angle=jnp.asarray(angles[t])[None],
    ) for t in range(T)]
    view_payload = {view: dict(
        view_idx=jnp.asarray([view], jnp.int32),
        obs_idx=jnp.asarray([obs.index(view)], jnp.int32),
    ) for view in obs}
    batches = {(t, view): {**frame_payload[t], **view_payload[view]}
               for t in range(T) for view in obs}

    # Warm (compile) outside the timed window, then train. The step donates
    # its input state, so the warmup must thread it like any other step.
    if args.steps_per_call > 1:
        from pose_splatter_tpu.train.loop import make_train_multi_step

        frames_dev = dict(
            mask=jnp.asarray(masks[:, obs]),
            img=jnp.asarray(imgs[:, obs]),
            p_3d=jnp.asarray(centers),
            angle=jnp.asarray(angles),
        )
        K = args.steps_per_call
        mstep = make_train_multi_step(
            model, tx, img_lambda=0.5, ssim_lambda=0.1,
            frames=frames_dev, steps_per_call=K)

        def draw(k):
            fi = rng.integers(T, size=k).astype(np.int32)
            vs = rng.choice(obs, size=k).astype(np.int32)
            oi = np.array([obs.index(int(v)) for v in vs], np.int32)
            return jnp.asarray(fi), jnp.asarray(vs), jnp.asarray(oi)

        state, warm_metrics = mstep(state, *draw(K))
        jax.block_until_ready(warm_metrics)
        t_start = time.perf_counter()
        metrics = {}
        done = 0
        while done < args.steps:
            state, metrics = mstep(state, *draw(K))
            done += K
            if done % max(K, 50 - 50 % K) < K:
                print(f"step {done}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()),
                    file=sys.stderr)
        jax.block_until_ready(metrics)
        train_time = time.perf_counter() - t_start
    else:
        state, warm_metrics = step(state, batches[(0, obs[0])])
        jax.block_until_ready(warm_metrics)
        t_start = time.perf_counter()
        metrics = {}
        for i in range(args.steps):
            t = int(rng.integers(T))
            view = int(rng.choice(obs))
            state, metrics = step(state, batches[(t, view)])
            if (i + 1) % 50 == 0:
                print(f"step {i + 1}: " +
                      " ".join(f"{k}={float(v):.4f}"
                               for k, v in metrics.items()),
                      file=sys.stderr)
        jax.block_until_ready(metrics)
        train_time = time.perf_counter() - t_start

    # Evaluate on the HELD-OUT view over all frames.
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.save_state:
        import pickle

        with open(args.save_state, "wb") as f:
            pickle.dump(dict(
                params=jax.device_get(state.params),
                batch_stats=jax.device_get(state.batch_stats),
                scene=dict(cameras=C, width=W, height=H, grid=g,
                           mode=args.mode, frames=args.frames,
                           crop=args.crop, anchored=args.anchored,
                           radii=list(radii), min_n=args.min_n,
                           max_n=args.max_n),
            ), f)

    @jax.jit
    def eval_frame(variables, mask, img, p_3d, angle, target, tmask):
        rgb, alpha, _ = model.forward(
            variables, mask, img, p_3d, angle, holdout, train=False)
        iou = 1.0 - iou_loss(jnp.where(alpha[0] > 0.5, 1.0, 0.0), tmask)
        return psnr(rgb[0], target), ssim(rgb[0], target), iou

    psnrs, ssims, ious = [], [], []
    for t in range(T):
        p, s, i = eval_frame(
            variables, jnp.asarray(masks[t][obs]), jnp.asarray(imgs[t][obs]),
            jnp.asarray(centers[t]), jnp.asarray(angles[t]),
            jnp.asarray(imgs[t][holdout]), jnp.asarray(masks[t][holdout]))
        psnrs.append(float(p))
        ssims.append(float(s))
        ious.append(float(i))

    # Reference eval protocol (scripts/utils/evaluate_model.py:80-227):
    # render ALL C views per frame — observed ones included — and report
    # per-camera l1 / iou / soft_iou / psnr / ssim (its metrics_test.csv
    # row shape). This is the only protocol under which the reference's
    # view-independent 2D renderer can score well, so the faithful-2D
    # parity claim must be made here, not on the holdout column.
    per_cam = None
    if args.per_camera:
        all_views = jnp.arange(C, dtype=jnp.int32)

        @jax.jit
        def eval_all_views(variables, mask, img, p_3d, angle):
            rgb, alpha, _ = model.forward(
                variables, mask, img, p_3d, angle, all_views, train=False)
            return rgb, alpha

        cams = {v: dict(l1=[], iou=[], soft_iou=[], psnr=[], ssim=[])
                for v in range(C)}
        for t in range(T):
            rgb, alpha = eval_all_views(
                variables, jnp.asarray(masks[t][obs]),
                jnp.asarray(imgs[t][obs]), jnp.asarray(centers[t]),
                jnp.asarray(angles[t]))
            for v in range(C):
                tgt = jnp.asarray(imgs[t][v])
                tmask = jnp.asarray(masks[t][v])
                hard = jnp.where(alpha[v] > 0.5, 1.0, 0.0)
                inter = jnp.sum(hard * tmask)
                union = jnp.sum(jnp.maximum(hard, tmask))
                msum = jnp.maximum(jnp.sum(tmask), 1.0)
                cams[v]["l1"].append(
                    float(jnp.sum(jnp.abs(tgt - rgb[v])) / msum))
                cams[v]["iou"].append(float(inter / jnp.maximum(union, 1.0)))
                cams[v]["soft_iou"].append(
                    1.0 - float(iou_loss(alpha[v], tmask)))
                cams[v]["psnr"].append(float(psnr(rgb[v], tgt)))
                cams[v]["ssim"].append(float(ssim(rgb[v], tgt)))
        per_cam = {
            str(v): {k: round(float(np.mean(vals)), 4)
                     for k, vals in cams[v].items()}
            for v in range(C)
        }
        obs_psnr = float(np.mean([per_cam[str(v)]["psnr"] for v in obs]))
        obs_ssim = float(np.mean([per_cam[str(v)]["ssim"] for v in obs]))

    report = {
        "config": (f"{W}x{H} grid{g} {args.mode}"
                   + ("-anchored" if args.anchored else "") + f" C{C}"),
        "steps": args.steps,
        "train_time_s": round(train_time, 2),
        "steps_per_s": round(args.steps / train_time, 2),
        "holdout_psnr_db": round(float(np.mean(psnrs)), 2),
        "holdout_ssim": round(float(np.mean(ssims)), 4),
        "holdout_iou": round(float(np.mean(ious)), 4),
        "backend": jax.default_backend(),
    }
    if per_cam is not None:
        report["per_camera"] = per_cam
        report["observed_psnr_db"] = round(obs_psnr, 2)
        report["observed_ssim"] = round(obs_ssim, 4)
        report["holdout_view"] = holdout
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms:
            report["hbm_peak_bytes"] = int(ms.get("peak_bytes_in_use", 0))
            report["hbm_limit_bytes"] = int(ms.get("bytes_limit", 0))
    except Exception:
        pass
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
