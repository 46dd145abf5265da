"""Multi-host scale-out: jax.distributed wiring + process-sharded data.

The reference is strictly single-process/single-GPU (SURVEY.md §2: no
torch.distributed anywhere; device pick at train/config.py:61). This module
is the new-framework communication backend standing in for the absent NCCL
layer (SURVEY.md:118-125, 376-379):

- :func:`initialize` wraps ``jax.distributed.initialize`` so every process
  sees the *global* device list; :func:`make_mesh` (parallel/mesh.py) then
  lays the DCN ``hosts`` axis over processes.
- :func:`global_batch` assembles a globally-sharded jax.Array from each
  process's local batch slice without any cross-host data movement
  (``jax.make_array_from_process_local_data``), so input pipelines stay
  process-local — each host loads/generates only its own 1/num_processes
  of the batch.
- :func:`process_shard` slices host-side work lists (file lists, dataset
  indices) per process for the disk-backed pipelines.

Typical multi-host invocation (documented in README "Scale-out"):

    JAX_COORDINATOR=host0:9999 NPROC=4 PROC_ID=$i python train_seg.py ...

with ``initialize()`` called before any other jax use.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from mtg_card_image_segmentation_tpu.parallel.mesh import batch_spec, mask_spec


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the environment.

    Reads ``JAX_COORDINATOR`` / ``NPROC`` / ``PROC_ID`` when args are None.
    Returns True when distributed mode was initialized, False when running
    single-process (no coordinator configured) — callers can use the same
    code path either way. Must run before the first jax backend touch.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if not coordinator_address:
        return False
    num_processes = num_processes or int(os.environ["NPROC"])
    process_id = process_id if process_id is not None else int(os.environ["PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def process_shard(items: Sequence, *, index: Optional[int] = None,
                  count: Optional[int] = None) -> list:
    """Deterministic per-process slice of a host-side work list (file paths,
    sample indices): process i takes items[i::count]. Single-process returns
    everything unchanged."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    return list(items[index::count])


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def global_arrays(mesh: Mesh, *local_arrays: np.ndarray, specs=None):
    """Assemble one globally-sharded jax.Array per local array (generic
    N-array form of :func:`global_batch`; the pose pipeline ships three).

    ``specs``: per-array PartitionSpec list; defaults to batch_spec() for
    all. Each process passes its own (local_B, ...) slice; no host ever
    materializes the full global batch.
    """
    n = jax.process_count()
    if specs is None:
        specs = [batch_spec()] * len(local_arrays)
    out = []
    for arr, spec in zip(local_arrays, specs):
        arr = np.asarray(arr)
        if n == 1:
            out.append(jax.device_put(arr, NamedSharding(mesh, spec)))
            continue
        gshape = (n * arr.shape[0],) + tuple(arr.shape[1:])
        out.append(jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), arr, gshape
        ))
    return tuple(out)


def global_batch(
    mesh: Mesh, local_images: np.ndarray, local_masks: Optional[np.ndarray] = None
):
    """Assemble globally-sharded device arrays from per-process local
    batches (the multi-host replacement for mesh.shard_batch).

    Each process passes its own (local_B, H, W, C) slice; the returned
    jax.Array has global shape (num_processes * local_B, H, W, C) laid out
    by batch_spec() — no host ever materializes the full global batch.
    """
    n = jax.process_count()
    if n == 1:
        from mtg_card_image_segmentation_tpu.parallel.mesh import shard_batch

        return shard_batch(mesh, local_images, local_masks)
    img_sh = NamedSharding(mesh, batch_spec())
    gshape = (n * local_images.shape[0],) + tuple(local_images.shape[1:])
    images = jax.make_array_from_process_local_data(img_sh, local_images, gshape)
    if local_masks is None:
        return images
    msk_sh = NamedSharding(mesh, mask_spec())
    mshape = (n * local_masks.shape[0],) + tuple(local_masks.shape[1:])
    masks = jax.make_array_from_process_local_data(msk_sh, local_masks, mshape)
    return images, masks
