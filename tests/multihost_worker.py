"""Worker for tests/test_multihost.py: one process of a real
``jax.distributed`` run on CPU backends.

Each process owns 2 virtual CPU devices; the global mesh spans
2 processes x 2 devices. Every process loads ONLY its frame stride and
contributes its local slice of the global batch; one DP train step runs;
the (replicated) loss is printed so the launcher can assert all processes
agree.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import optax  # noqa: E402


def main():
    coordinator, num_procs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from pose_splatter_tpu.parallel import (
        assemble_global_batch,
        global_mesh,
        initialize_distributed,
        make_sharded_train_step,
        process_local_indices,
        replicate_state,
    )
    from pose_splatter_tpu.models.pose_splatter import PoseSplatter
    from pose_splatter_tpu.train.loop import create_train_state
    from pose_splatter_tpu.utils.cameras import camera_extrinsic_spherical

    initialize_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs
    n_dev = len(jax.devices())
    assert n_dev == 2 * num_procs, f"{n_dev} global devices"

    C, H, W, F = 2, 32, 32, 40.0
    Ks = np.array([[[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]]] * C, np.float32)
    Es = np.stack([
        camera_extrinsic_spherical(1.5, np.pi / 3, 2 * np.pi * i / C)
        for i in range(C)
    ]).astype(np.float32)
    model = PoseSplatter(Ks, Es, W, H, ell=0.6, grid_size=16, min_n=16,
                         max_n=64, volume_idx=[[0, 16]] * 3, num_unets=1,
                         base_filters=4, render_mode="global")

    mesh = global_mesh()
    tx = optax.adam(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    state = replicate_state(state, mesh)

    # Global frame "dataset": deterministic per-frame blobs; every process
    # materializes only its own stride of the global batch.
    B = n_dev  # one frame per device
    rng_order = np.random.default_rng(0)
    order = rng_order.permutation(B)  # same on every process (same seed)
    mine = process_local_indices(order, B, pid, num_procs)

    def frame(i):
        yy, xx = np.mgrid[0:H, 0:W]
        m = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2)
             < (H / 4 + i) ** 2).astype(np.float32)
        img = np.stack([m * 0.8, m * 0.2, m * 0.5], -1)
        return np.stack([m] * C), np.stack([img] * C)

    masks, imgs = zip(*[frame(int(i)) for i in mine])
    local = dict(
        mask=np.stack(masks).astype(np.float32),
        img=np.stack(imgs).astype(np.float32),
        p_3d=np.zeros((len(mine), 3), np.float32),
        angle=np.zeros((len(mine),), np.float32),
        view_idx=np.zeros((len(mine),), np.int32),
        obs_idx=np.zeros((len(mine),), np.int32),
    )
    batch = assemble_global_batch(local, mesh)
    assert batch["mask"].shape[0] == B  # global leading axis

    step = make_sharded_train_step(model, tx, img_lambda=0.5,
                                   ssim_lambda=0.0, mesh=mesh)
    state, metrics = step(state, batch)
    state, metrics = step(state, batch)
    loss = float(metrics["total"])
    assert np.isfinite(loss)
    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
