"""Device mesh construction and multi-host runtime init.

Axes:
  * ``data`` — batch sharding (the reference's DDP data parallelism,
    trainer.py:226-235, as a mesh axis);
  * ``seq``  — optional sharding of the 160k-sample time axis.  The
    model is convolutional with bounded lookback, so XLA GSPMD turns the
    causal time-shifts into cheap neighbor halo exchanges over ICI.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def initialize_distributed(config) -> None:
    """Multi-host JAX runtime init (replaces dist.init_process_group +
    MASTER_ADDR/PORT env plumbing, trainer.py:627-631).  No-op on a
    single host."""
    if config.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
        )
        logger.info(
            "distributed runtime: process %d/%d, %d local / %d global "
            "devices", jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())


def create_mesh(mesh_config=None, devices=None,
                batch_size: Optional[int] = None) -> Mesh:
    """Build a (data, seq) mesh.

    mesh_config.data == -1 means "all devices not used by seq"; when a
    ``batch_size`` is also given, the data axis auto-fits to the largest
    divisor of the batch that the devices allow (idling the remainder
    with a warning) instead of failing on non-divisible batches.
    An explicitly requested shape is honored strictly.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_config is None:
        data, seq = n, 1
    else:
        data, seq = mesh_config.axis_sizes(n)
    auto_data = mesh_config is None or mesh_config.data <= 0
    if auto_data and batch_size is not None:
        avail = n // seq
        # largest divisor of the batch that fits the available devices
        # (gcd would idle devices needlessly: batch 6 on 4 devices must
        # give data=3, not gcd(6,4)=2)
        data = max(d for d in range(1, avail + 1) if batch_size % d == 0)
        if data * seq < n:
            logger.warning(
                "mesh auto-fit: using %d of %d devices (data=%d, seq=%d) "
                "so the data axis divides batch_size=%d",
                data * seq, n, data, seq, batch_size)
        devices = list(np.asarray(devices).flat)[: data * seq]
        n = len(devices)
    if data * seq != n:
        raise ValueError(
            f"mesh {data}x{seq} does not cover {n} devices")
    try:
        arr = mesh_utils.create_device_mesh((data, seq), devices=devices)
    except Exception:  # e.g. shapes the topology helper refuses
        arr = np.asarray(devices).reshape(data, seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-process share of the global batch (the DistributedSampler
    equivalent, reference dataset.py:79-87).

    Matches ``shard_batch``'s host_local_array_to_global_array
    semantics: every process contributes ``global / process_count``
    rows, which requires the data axis to span processes evenly.
    """
    data = mesh.shape[DATA_AXIS]
    procs = jax.process_count()
    if global_batch_size % data:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data-axis "
            f"size {data}")
    if data % procs:
        raise ValueError(
            f"data-axis size {data} must be a multiple of the process "
            f"count {procs} for per-process batch sharding")
    if global_batch_size % procs:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by process "
            f"count {procs}")
    return global_batch_size // procs


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-host barrier (the reference's dist.barrier(),
    trainer.py:385-387)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
