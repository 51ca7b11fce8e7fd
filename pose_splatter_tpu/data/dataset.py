"""Frame dataset + host-side loader.

Functional parity with the reference dataset
(``/root/reference/src/data.py:15-76``):

- frames stored as uint8 [T, C, H, W, 3]; read from ``images.zarr`` (key
  ``images``) when zarr is importable, else directly from ``images.h5``
  (this framework's native path — zarr is optional here, mandatory there);
- mask derived from the white background: after ``/255``, a pixel belongs to
  the background iff its red channel equals 1.0 (``data.py:67``);
- per-frame centers/angles from ``center_rotation.npz`` (``data.py:49-51``);
- splits: train/valid/test = first/middle/last thirds (``data.py:36-46``);
  ``split="all"`` enumerates frame x view (``data.py:54-64``);
- only observed (non-holdout) views are returned.

Deviations (documented): images are channel-LAST ([C', H, W, 3]) for TPU
NDHWC layouts, where the reference permutes to [C', 3, H, W]; an optional
``max_frames`` cap is honored (the reference declares but never reads it).

The uint8→float conversion + mask extraction hot loop dispatches to the
native C++ helper (``pose_splatter_tpu.data.native``) when built, else
NumPy. ``FrameLoader`` adds shuffling, batching into the jitted train-step
layout, and a ``workers``-thread prefetch pool (the reference uses torch
DataLoader *processes*, train_script.py:276-278; threads suffice here
because the decode is native/NumPy code that releases the GIL — Zarr chunk
reads run concurrently, while h5py serializes under its global lock but
still overlaps with decode).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import zarr  # optional

    _HAVE_ZARR = True
except ImportError:  # pragma: no cover
    _HAVE_ZARR = False

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _load_native():
    try:
        from pose_splatter_tpu.data import native

        return native if native.available() else None
    except Exception:
        return None


_NATIVE = None


def decode_frame(raw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """uint8 [C,H,W,3] → (mask [C,H,W] f32, img [C,H,W,3] f32 in [0,1])."""
    global _NATIVE
    if _NATIVE is None:
        _NATIVE = _load_native() or False
    if _NATIVE:
        return _NATIVE.decode_frame(raw)
    img = raw.astype(np.float32) / 255.0
    mask = np.where(img[..., 0] == 1.0, 0.0, 1.0).astype(np.float32)
    return mask, img


class FrameDataset:
    """Random access to (mask, img, p_3d, angle, view_idx) samples."""

    SPLITS = ("train", "valid", "test", "all", "all_volumes")

    def __init__(
        self,
        img_fn: str,
        angle_fn: str,
        C: int,
        holdout_views: Sequence[int] = (),
        split: str = "train",
        max_frames: Optional[int] = None,
        seed: int = 0,
    ):
        assert split in self.SPLITS, f"unknown split {split}"
        self.split = split
        self.C = C
        self.observed_views = np.array(
            [i for i in range(C) if i not in holdout_views], dtype=int
        )
        self._rng = np.random.default_rng(seed)

        zarr_fn = img_fn[:-3] + ".zarr" if img_fn.endswith(".h5") else img_fn
        if _HAVE_ZARR and os.path.exists(zarr_fn):
            self.images = zarr.open(zarr_fn, "r")["images"]
        else:
            if h5py is None:
                raise ImportError("h5py required")
            self._h5 = h5py.File(img_fn, "r")
            self.images = self._h5["images"]

        T = len(self.images)
        if max_frames is not None:
            T = min(T, max_frames)
        a1, a2 = 0, T // 3
        a3, a4 = 2 * a2, T
        if split == "train":
            self.i1, self.i2 = a1, a2
        elif split == "valid":
            self.i1, self.i2 = a2, a3
        elif split == "test":
            self.i1, self.i2 = a3, a4
        else:
            self.i1, self.i2 = a1, a4

        d = np.load(angle_fn)
        self.angles = d["angles"]
        self.centers = d["centers"]

    def __len__(self) -> int:
        if self.split == "all":
            return (self.i2 - self.i1) * self.C
        return self.i2 - self.i1

    def get(
        self,
        idx: int,
        view_idx: Optional[int] = None,
        angle_offset: float = 0.0,
        center_offset: float = 0.0,
    ):
        """Returns (mask [C',H,W], img [C',H,W,3], p_3d [3], angle, view_idx)."""
        if self.split == "all":
            view_idx = idx % self.C
            idx = idx // self.C
        idx += self.i1
        if view_idx is None:
            view_idx = int(self._rng.choice(self.observed_views))

        raw = np.asarray(self.images[idx])  # [C,H,W,3] uint8
        mask, img = decode_frame(raw)
        mask = mask[self.observed_views]
        img = img[self.observed_views]

        p_3d = (self.centers[idx] + center_offset).astype(np.float32)
        angle = float(self.angles[idx] + angle_offset)
        return mask, img, p_3d, angle, view_idx

    def __getitem__(self, idx):
        return self.get(idx)


class FrameLoader:
    """Shuffling, batching, and multi-threaded background prefetch.

    Yields batch dicts matching ``make_train_step``:
        mask [B,C',H,W], img [B,C',H,W,3], p_3d [B,3], angle [B],
        view_idx [B] int32, obs_idx [B] int32.

    ``workers`` threads build batches concurrently (read + decode release
    the GIL); up to ``prefetch + workers`` batches are in flight, yielded
    in order.
    """

    def __init__(
        self,
        dataset: FrameDataset,
        batch_size: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        drop_last: bool = True,
        adaptive_fn=None,
        workers: int = 4,
    ):
        """``adaptive_fn(mask [C',H,W]) -> (temp_K [C',3,3], seed [3])`` is
        the adaptive-camera host hook (``adjust_principal_points_to_seed``):
        when set, each frame's batch gains ``K_mask`` (temp intrinsics) and
        ``seed_3d`` (the triangulated seed, repositioning only the carving
        grid), matching the reference's in-forward recomputation
        (``src/shape_carver.py:328-347``). ``p_3d`` stays the dataset
        center — the reference's pose transform uses it unchanged
        (``src/model.py:154``)."""
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.adaptive_fn = adaptive_fn
        self.workers = max(1, workers)
        self._rng = np.random.default_rng(seed)
        obs = list(dataset.observed_views)
        self._obs_pos = {v: i for i, v in enumerate(obs)}

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _make_batch(
        self, idxs: np.ndarray, view_choices: Optional[np.ndarray] = None
    ) -> Dict[str, np.ndarray]:
        masks, imgs, p3ds, angles, views, obs = [], [], [], [], [], []
        k_masks, seeds = [], []
        for j, i in enumerate(idxs):
            v_pre = None if view_choices is None else int(view_choices[j])
            m, im, p, a, v = self.ds.get(int(i), view_idx=v_pre)
            if self.adaptive_fn is not None:
                temp_K, seed = self.adaptive_fn(m)
                k_masks.append(np.asarray(temp_K, np.float32))
                seeds.append(np.asarray(seed, np.float32))
            masks.append(m)
            imgs.append(im)
            p3ds.append(p)
            angles.append(a)
            views.append(v)
            obs.append(self._obs_pos[v])
        batch = dict(
            mask=np.stack(masks),
            img=np.stack(imgs),
            p_3d=np.stack(p3ds),
            angle=np.array(angles, np.float32),
            view_idx=np.array(views, np.int32),
            obs_idx=np.array(obs, np.int32),
        )
        if k_masks:
            batch["K_mask"] = np.stack(k_masks)
            batch["seed_3d"] = np.stack(seeds)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        # Pre-draw the per-sample view choices in iteration order so the
        # thread pool cannot perturb determinism (dataset._rng is shared
        # and not thread-safe).
        views = [
            self.ds._rng.choice(
                self.ds.observed_views, size=len(b)
            ).astype(np.int64)
            if self.ds.split != "all" else None
            for b in batches
        ]

        if self.prefetch <= 0:
            for b, v in zip(batches, views):
                yield self._make_batch(b, v)
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        n_workers = min(self.workers, max(1, n_batches))
        window = self.prefetch + n_workers
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            futs: deque = deque()
            next_i = 0
            while next_i < n_batches and len(futs) < window:
                futs.append(
                    ex.submit(self._make_batch, batches[next_i],
                              views[next_i]))
                next_i += 1
            while futs:
                yield futs.popleft().result()
                if next_i < n_batches:
                    futs.append(
                        ex.submit(self._make_batch, batches[next_i],
                                  views[next_i]))
                    next_i += 1
