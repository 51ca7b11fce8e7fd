"""Stage breakdown of the full PoseSplatter step at the north-star shape
(576x512, grid 128 cropped to (128,128,64), 6 cameras, 2D mode)."""
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

C, H, W = 6, 512, 576
g = 128
MODE = "2d"

f = 1.7 * W
Ks = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]] * C, np.float32)
Es = np.stack([
    camera_extrinsic_spherical(1.0, np.pi / 2.2, 2 * np.pi * i / C)
    for i in range(C)
]).astype(np.float32)
model = PoseSplatter(
    Ks, Es, W, H, ell=0.35, grid_size=g,
    volume_idx=[[0, 128], [0, 128], [32, 96]],
    holdout_views=[C - 1], gaussian_mode=MODE,
    render_mode="pallas" if jax.default_backend() == "tpu" else "tiled",
    min_n=512, max_n=8192,
)
obs = model.observed_views
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:H, 0:W]
m = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 5) ** 2).astype(np.float32)
mask = jnp.asarray(np.stack([m] * len(obs)))
img = jnp.asarray(np.stack([np.stack([m * .7, m * .3, m * .5], -1)] * len(obs)))
p3d = jnp.zeros(3)
ang = jnp.float32(0.2)

tx = optax.adam(1e-3)
state = create_train_state(model, jax.random.PRNGKey(0), tx)
state = state._replace(params=init_means2d_center(state.params, W, H))
variables = {"params": state.params, "batch_stats": state.batch_stats}


def timeit(name, fn, *a, iters=5):
    red = jax.jit(lambda *x: jax.tree.reduce(
        lambda p, q: p + q,
        jax.tree.map(lambda t: t.astype(jnp.float32).sum(), fn(*x))))
    out = red(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*a)
    np.asarray(out)
    print(f"{name:28s}: {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")


timeit("carve", lambda mk, im: model.carve(mk, im, p3d, ang), mask, img)


def unet(v, mk, im):
    vol = model.carve(mk, im, p3d, ang)
    vol = jnp.transpose(vol, (1, 2, 3, 0))[None]
    return model.net.apply(v, vol, False, method="process_volume")


timeit("carve+unets", unet, variables, mask, img)


def gauss(v, mk, im):
    flat = unet(v, mk, im)
    return model.gaussians_from_volume(v, flat)


timeit("carve+unets+heads", gauss, variables, mask, img)


def fwd(v, mk, im):
    rgb, alpha, _ = model.forward(v, mk, im, p3d, ang, 0, train=False)
    return rgb, alpha


timeit("full fwd (eval)", fwd, variables, mask, img)

batch = dict(mask=mask[None], img=img[None], p_3d=p3d[None],
             angle=ang[None], view_idx=jnp.zeros((1,), jnp.int32),
             obs_idx=jnp.zeros((1,), jnp.int32))
step = make_train_step(model, tx, img_lambda=0.5, ssim_lambda=0.1,
                       donate=False)
new_state, metrics = step(state, batch)
jax.block_until_ready(metrics)
t0 = time.perf_counter()
for _ in range(5):
    new_state, metrics = step(state, batch)
np.asarray(metrics["total"])
print(f"{'train step (fwd+bwd+adam)':28s}: "
      f"{(time.perf_counter()-t0)/5*1e3:9.2f} ms")


# ---- backward attribution ----
import optax as _optax


def t_grad(name, loss_fn, *a, iters=5):
    g = jax.jit(jax.grad(loss_fn))
    out = g(*a)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    np.asarray(jax.tree.leaves(out)[0])
    print(f"{name:28s}: {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")


params = variables["params"]
bs = variables["batch_stats"]


def unet_loss(p):
    vol = model.carve(mask, img, p3d, ang)
    vol = jnp.transpose(vol, (1, 2, 3, 0))[None]
    flat = model.net.apply({"params": p, "batch_stats": bs}, vol, False,
                           method="process_volume")
    return (flat ** 2).mean()


t_grad("grad: carve+unets", unet_loss, params)


def headrender_loss(p):
    v = {"params": p, "batch_stats": bs}
    vol = model.carve(mask, img, p3d, ang)
    vol = jnp.transpose(vol, (1, 2, 3, 0))[None]
    flat = model.net.apply(v, vol, False, method="process_volume")
    gs = model.gaussians_from_volume(v, flat)
    rgb, alpha = model.render(gs, jnp.zeros((1,), jnp.int32))
    return (rgb ** 2).mean() + (alpha ** 2).mean()


t_grad("grad: thru render", headrender_loss, params)

from pose_splatter_tpu.train.losses import total_loss as _total


def full_loss(p):
    v = {"params": p, "batch_stats": bs}
    vol = model.carve(mask, img, p3d, ang)
    vol = jnp.transpose(vol, (1, 2, 3, 0))[None]
    flat = model.net.apply(v, vol, False, method="process_volume")
    gs = model.gaussians_from_volume(v, flat)
    rgb, alpha = model.render(gs, jnp.zeros((1,), jnp.int32))
    loss, _ = _total(rgb[0], alpha[0], img[0], mask[0], 0.5, 0.1)
    return loss


t_grad("grad: full loss (ssim)", full_loss, params)
