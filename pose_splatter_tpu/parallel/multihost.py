"""Multi-host execution: ``jax.distributed`` init, per-process data
loading, global batch assembly, and a scaling harness.

The reference has no distributed path at all (SURVEY.md §2.D); this is the
north-star design (BASELINE.md: Mpix/s at 1 chip / 1 host / N≥2 hosts with
≥80% scaling efficiency). The layout is standard JAX SPMD:

- every process runs the same program and calls
  :func:`initialize_distributed` (coordinator address + process id from
  args or the standard env vars);
- a global ``data`` mesh spans all processes' devices (DP over frames;
  gradients psum over ICI within a host and DCN across hosts, overlapped
  with the backward pass by XLA's latency-hiding scheduler);
- each process loads only its own frame shard
  (:func:`process_local_indices` — process-strided, so shuffling stays
  globally unbiased) and contributes its local slice of the global batch
  via ``jax.make_array_from_process_local_data``
  (:func:`assemble_global_batch`);
- the jitted train step is the single-controller
  ``make_sharded_train_step`` — unchanged: multi-host is purely an input
  placement + runtime-init concern.

Tested with real multi-process ``jax.distributed`` on CPU backends
(``tests/test_multihost.py`` spawns coordinator + workers over localhost).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op when single-process).

    Falls back to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) when args are omitted; on
    TPU pods with a supported runtime, ``jax.distributed.initialize()``
    autodetects everything.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_local_indices(
    order: np.ndarray,
    batch_size: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This process's stride of a (shuffled) global frame order.

    ``order`` is the identical global permutation on every process (same
    seed); the global batch is ``batch_size`` frames of which this process
    materializes ``batch_size / process_count`` — positions
    ``p::process_count`` within each batch window, so any global batch is
    the disjoint union of the per-process slices.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if batch_size % process_count:
        raise ValueError(
            f"global batch {batch_size} not divisible by "
            f"{process_count} processes")
    n_batches = len(order) // batch_size
    windows = order[: n_batches * batch_size].reshape(n_batches, batch_size)
    return windows[:, process_index::process_count].reshape(-1)


def assemble_global_batch(
    local_batch: Dict[str, np.ndarray],
    mesh: Mesh,
    batch_axis: str = "data",
) -> Dict[str, jax.Array]:
    """Per-process local arrays → globally sharded jax.Arrays.

    ``local_batch`` leaves have leading axis ``global_batch /
    process_count``; the result's leading axis is the global batch, sharded
    over ``batch_axis`` (addressable shards come from this process's data
    only — no cross-host transfer).
    """
    def put(x):
        spec = P(batch_axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return {k: put(v) for k, v in local_batch.items()}


def global_mesh(batch_axis: str = "data") -> Mesh:
    """1-D mesh over ALL devices of ALL processes."""
    return Mesh(np.asarray(jax.devices()), (batch_axis,))


# ----------------------------------------------------------------------------
# Scaling harness.
# ----------------------------------------------------------------------------

def measure_steps_per_s(step_fn, state, batch, iters: int = 10) -> float:
    """Wall-clock steps/s of a compiled train step (post-warmup)."""
    state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    return iters / (time.perf_counter() - t0)


def scaling_report(make_step_and_inputs, device_counts=None,
                   spmd_baseline: bool = False) -> Dict[str, Any]:
    """steps/s and per-device scaling efficiency across device counts.

    ``make_step_and_inputs(devices) -> (step_fn, state, batch)`` builds a
    DP step over a mesh on exactly those devices with a proportionally
    sized batch (weak scaling).

    ``efficiency`` is classic weak-scaling efficiency (global frames/s vs
    perfect linear scaling of the 1-device rate) — meaningful on real
    multi-chip hardware, where each device adds compute.

    ``spmd_baseline=True`` adds ``spmd_efficiency``: the time of ONE device
    stepping the same GLOBAL batch divided by the n-device DP step time.
    This isolates the partitioning + collective overhead from hardware
    throughput, which is the only meaningful scaling figure on a VIRTUAL
    device mesh (``--xla_force_host_platform_device_count``), where all
    "devices" share the same physical cores and classic weak scaling
    merely measures host contention.
    """
    if device_counts is None:
        n = len(jax.devices())
        device_counts = [1]
        while device_counts[-1] * 2 <= n:
            device_counts.append(device_counts[-1] * 2)
    rows = []
    base = None
    for n in device_counts:
        step_fn, state, batch = make_step_and_inputs(jax.devices()[:n])
        sps = measure_steps_per_s(step_fn, state, batch)
        frames = sps * n  # weak scaling: batch grows with n
        if base is None:
            base = frames
        row = {
            "devices": n,
            "steps_per_s": round(sps, 4),
            "frames_per_s": round(frames, 4),
            "efficiency": round(frames / (base * n / device_counts[0]), 4),
        }
        if spmd_baseline and n > 1:
            # Same global batch on ONE device: replicate-free reference.
            step1, state1, batch1 = make_step_and_inputs(jax.devices()[:1])
            big = jax.device_put(
                jax.tree.map(
                    lambda x: jnp.concatenate([x] * n, axis=0),
                    jax.device_get(batch1)),
                NamedSharding(Mesh(np.asarray(jax.devices()[:1]), ("data",)),
                              P("data")))
            sps1 = measure_steps_per_s(step1, state1, big)
            row["spmd_efficiency"] = round(sps / sps1, 4)
        rows.append(row)
    return {"rows": rows}
