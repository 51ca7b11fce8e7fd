"""Host-side video decode utilities (OpenCV, gated).

Video IO stays on the host (SURVEY.md §2.C: not TPU work). Decoding is the
preprocessing bottleneck in the reference (joblib over frame chunks,
``write_images.py:165-167``); here the same chunked process-parallel pattern
is kept for decode while the *carving math* moves onto the TPU in jitted
batches (see ``center_rotation.py``).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
except ImportError:  # pragma: no cover
    cv2 = None
    _HAVE_CV2 = False


def require_cv2():
    if not _HAVE_CV2:
        raise ImportError("OpenCV (cv2) is required for video preprocessing")


def video_frame_count(video_fn: str) -> int:
    require_cv2()
    cap = cv2.VideoCapture(video_fn)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def iter_mask_frames(
    mask_video_fns: Sequence[str],
    frame_indices: Sequence[int],
    frame_jump: int,
    downsample: int = 1,
    binarize: bool = True,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_idx, masks [C,h,w] float {0,1}) for each requested frame.

    Reads every video sequentially with ``frame_jump`` skipping, matching
    ``calculate_center_rotation.py:93-116``.
    """
    require_cv2()
    caps = [cv2.VideoCapture(fn) for fn in mask_video_fns]
    for cap in caps:
        cap.set(cv2.CAP_PROP_POS_FRAMES, frame_indices[0])
    try:
        for frame_idx in frame_indices:
            masks = []
            ok = True
            for cap in caps:
                ret, frame = cap.read()
                if not ret:
                    ok = False
                    break
                masks.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
                for _ in range(frame_jump - 1):
                    cap.read()
            if not ok:
                break
            m = np.array(masks).astype(np.float32) / 255.0
            if downsample != 1:
                m = m[:, ::downsample][:, :, ::downsample]
            if binarize:
                m = np.where(m > 0.5, 1.0, 0.0).astype(np.float32)
            yield frame_idx, m
    finally:
        for cap in caps:
            cap.release()


def iter_masked_rgb_frames(
    mask_video_fns: Sequence[str],
    video_fns: Sequence[str],
    frame_indices: Sequence[int],
    frame_jump: int,
    downsample: int = 1,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_idx, frames [C,h,w,3] uint8) with the background
    whited out where mask < 128 (``write_images.py:84-91``)."""
    require_cv2()
    WHITE = 255 * np.ones(3, np.uint8)
    mask_caps = [cv2.VideoCapture(fn) for fn in mask_video_fns]
    video_caps = [cv2.VideoCapture(fn) for fn in video_fns]
    for cap in mask_caps + video_caps:
        cap.set(cv2.CAP_PROP_POS_FRAMES, frame_indices[0])
    try:
        for frame_idx in frame_indices:
            masks, frames = [], []
            ok = True
            for mask_cap, video_cap in zip(mask_caps, video_caps):
                ret, frame = mask_cap.read()
                if not ret:
                    ok = False
                    break
                masks.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
                for _ in range(frame_jump - 1):
                    mask_cap.read()
                ret, frame = video_cap.read()
                if not ret:
                    ok = False
                    break
                frames.append(frame[..., ::-1])  # BGR → RGB
                for _ in range(frame_jump - 1):
                    video_cap.read()
            if not ok:
                break
            masks_a = np.array(masks)
            frames_a = np.array(frames)
            if downsample != 1:
                masks_a = masks_a[:, ::downsample][:, :, ::downsample]
                frames_a = frames_a[:, ::downsample][:, :, ::downsample]
            frames_a[masks_a < 128] = WHITE
            yield frame_idx, frames_a
    finally:
        for cap in mask_caps + video_caps:
            cap.release()
