"""SPMD parallelism: device mesh, sharding rules, distributed init.

The reference's distributed layer is single-node DDP over NCCL with
mp.spawn (trainer.py:619-644, 768-782).  The TPU-native equivalent is a
named device mesh + pjit: gradients all-reduce over ICI as XLA-inserted
psums, barriers are implicit in SPMD, and multi-host launch is
``jax.distributed.initialize`` — no process spawning, no backend flag.
"""

from movenet_tpu.parallel.mesh import (
    create_mesh,
    initialize_distributed,
    local_batch_size,
    sync_global_devices,
)
from movenet_tpu.parallel.sharding import (
    batch_sharding,
    make_parallel_train_step,
    make_parallel_scan_train_step,
    make_parallel_eval_step,
    replicate,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "initialize_distributed",
    "local_batch_size",
    "sync_global_devices",
    "batch_sharding",
    "make_parallel_train_step",
    "make_parallel_scan_train_step",
    "make_parallel_eval_step",
    "replicate",
    "shard_batch",
]
