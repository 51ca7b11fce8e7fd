"""Bisect the north-star train-step time by toggling components:
full | no-ssim | no-unets (ablation) | global-render."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pose_splatter_tpu.models.pose_splatter import (
    PoseSplatter, init_means2d_center,
)
from pose_splatter_tpu.train.loop import create_train_state, make_train_step
from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical

C, H, W, g = 6, 512, 576, 128

f = 1.7 * W
Ks = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]] * C, np.float32)
Es = np.stack([
    camera_extrinsic_spherical(1.0, np.pi / 2.2, 2 * np.pi * i / C)
    for i in range(C)
]).astype(np.float32)
yy, xx = np.mgrid[0:H, 0:W]
m = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 5) ** 2).astype(np.float32)


def run(name, ablation=False, ssim=0.1, render="pallas", mode="2d",
        num_unets=3):
    model = PoseSplatter(
        Ks, Es, W, H, ell=0.35, grid_size=g,
        volume_idx=[[0, 128], [0, 128], [32, 96]],
        holdout_views=[C - 1], gaussian_mode=mode,
        render_mode=render if jax.default_backend() == "tpu" else "tiled",
        min_n=512, max_n=8192, ablation=ablation, num_unets=num_unets,
    )
    obs = model.observed_views
    mask = jnp.asarray(np.stack([m] * len(obs)))
    img = jnp.asarray(np.stack(
        [np.stack([m * .7, m * .3, m * .5], -1)] * len(obs)))
    tx = optax.adam(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    if mode == "2d" and not ablation:
        state = state._replace(
            params=init_means2d_center(state.params, W, H))
    batch = dict(mask=mask[None], img=img[None], p_3d=jnp.zeros((1, 3)),
                 angle=jnp.full((1,), 0.2), view_idx=jnp.zeros((1,), jnp.int32),
                 obs_idx=jnp.zeros((1,), jnp.int32))
    step = make_train_step(model, tx, img_lambda=0.5, ssim_lambda=ssim,
                           donate=False)
    st, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(5):
        st, metrics = step(state, batch)
    np.asarray(metrics["total"])
    print(f"{name:28s}: {(time.perf_counter()-t0)/5*1e3:9.2f} ms",
          flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "full"):
    run("full step")
if which in ("all", "nossim"):
    run("no ssim", ssim=0.0)
if which in ("all", "ablation"):
    run("ablation (no unets)", ablation=True)
if which in ("all", "unet1"):
    run("1 unet", num_unets=1)
