"""Sharding rules and pjit-wrapped train/eval steps.

Layout:
  * parameters + optimizer state: replicated (channel sizes here are
    tiny — <=256 — so tensor parallelism buys nothing; the reference
    also replicates, via DDP);
  * batch codes (B, T) / (A, B, T): batch dim on ``data``, time dim on
    ``seq`` (when the seq axis is >1, XLA GSPMD inserts the
    receptive-field halo exchanges for the causal shifts);
  * video (B, F, H, W, C): batch on ``data`` (frames stay local: the
    video encoder's transposed upsampling is pointwise per frame).

The gradient all-reduce the reference gets from DDP hooks
(trainer.py:230-234) falls out of pjit: replicated-out params with
data-sharded inputs => XLA emits the psum over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from movenet_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS
from movenet_tpu.train.loop import Batch, make_eval_step, make_train_step


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, leading,
                   shard_time: Optional[bool] = None) -> Batch:
    """PartitionSpecs for a Batch (as a Batch pytree of specs).

    ``leading`` counts replicated leading axes ahead of the batch dim:
    0 for a plain (B, ...) batch, 1 for gradient accumulation (A, B, ...)
    OR a scanned multi-step batch (N, B, ...), 2 for both (N, A, B, ...).
    A bool is accepted for backward compatibility (True == 1).
    """
    if shard_time is None:
        shard_time = mesh.shape[SEQ_AXIS] > 1
    t_axis = SEQ_AXIS if shard_time else None
    lead = (None,) * int(leading)
    codes = P(*lead, DATA_AXIS, t_axis)
    video = P(*lead, DATA_AXIS, None, None, None, None)
    labels = P(*lead, DATA_AXIS)
    return Batch(codes=codes, video=video, labels=labels)


def _to_shardings(mesh: Mesh, batch: Batch, spec: Batch) -> Batch:
    codes = NamedSharding(mesh, spec.codes)
    video = None if batch.video is None else \
        NamedSharding(mesh, spec.video)
    labels = None if batch.labels is None else \
        NamedSharding(mesh, spec.labels)
    return Batch(codes=codes, video=video, labels=labels)


def shard_batch(mesh: Mesh, batch: Batch) -> Batch:
    """Place a host (numpy) Batch onto the mesh with the standard
    sharding.  On multi-host, each process contributes its local shard
    (make_array_from_process_local_data)."""
    spec = batch_sharding(mesh, batch.codes.ndim - 2)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        codes = multihost_utils.host_local_array_to_global_array(
            batch.codes, mesh, spec.codes)
        video = None
        if batch.video is not None:
            video = multihost_utils.host_local_array_to_global_array(
                batch.video, mesh, spec.video)
        labels = None
        if batch.labels is not None:
            labels = multihost_utils.host_local_array_to_global_array(
                batch.labels, mesh, spec.labels)
        return Batch(codes=codes, video=video, labels=labels)
    sh = _to_shardings(mesh, batch, spec)
    codes = jax.device_put(batch.codes, sh.codes)
    video = None if batch.video is None else \
        jax.device_put(batch.video, sh.video)
    labels = None if batch.labels is None else \
        jax.device_put(batch.labels, sh.labels)
    pack = None
    if batch.codes_pack is not None and len(mesh.devices.flat) == 1:
        # host-precomputed fused-kernel pack: single-device only (its
        # batch dim lives in lanes and cannot shard; mesh paths rebuild
        # per-shard packs in-device)
        pack = jax.device_put(batch.codes_pack,
                              NamedSharding(mesh, P()))
    return Batch(codes=codes, video=video, labels=labels,
                 codes_pack=pack)


def make_parallel_train_step(model, config, mesh: Mesh,
                             has_video: bool,
                             shard_time: Optional[bool] = None):
    """pjit the functional train step with explicit in/out shardings.

    The mesh is passed INTO the step builder: the fused Pallas path is
    shard_map'd over the data axis there (GSPMD cannot partition Mosaic
    custom calls), while the XLA path relies on these pjit shardings.
    """
    step = make_train_step(model, config, mesh)
    rep = replicate(mesh)
    spec = batch_sharding(mesh, config.accumulation_steps > 1, shard_time)
    codes_sh = NamedSharding(mesh, spec.codes)
    video_sh = NamedSharding(mesh, spec.video) if has_video else None
    labels_sh = NamedSharding(mesh, spec.labels)
    batch_sh = Batch(codes=codes_sh, video=video_sh, labels=labels_sh)

    return jax.jit(
        step,
        in_shardings=(rep, batch_sh),
        out_shardings=(rep, rep),
    )


def make_parallel_scan_train_step(model, config, mesh: Mesh,
                                  has_video: bool, n_steps: int,
                                  shard_time: Optional[bool] = None):
    """pjit ``n_steps`` optimizer steps scanned inside ONE executable.

    Batches carry a leading (n_steps,) axis (plus the accumulation axis
    when accumulation_steps > 1).  Amortizes per-dispatch host latency
    n_steps-fold; metrics come back for the LAST scanned step only.
    """
    from movenet_tpu.train.loop import make_scan_train_step

    step = make_scan_train_step(model, config, n_steps, mesh)
    rep = replicate(mesh)
    leading = 1 + (config.accumulation_steps > 1)
    spec = batch_sharding(mesh, leading, shard_time)
    codes_sh = NamedSharding(mesh, spec.codes)
    video_sh = NamedSharding(mesh, spec.video) if has_video else None
    labels_sh = NamedSharding(mesh, spec.labels)
    batch_sh = Batch(codes=codes_sh, video=video_sh, labels=labels_sh)
    return jax.jit(
        step,
        in_shardings=(rep, batch_sh),
        out_shardings=(rep, rep),
    )


def make_parallel_eval_step(model, config, mesh: Mesh, has_video: bool,
                            shard_time: Optional[bool] = None):
    step = make_eval_step(model, config, mesh)
    rep = replicate(mesh)
    spec = batch_sharding(mesh, False, shard_time)
    codes_sh = NamedSharding(mesh, spec.codes)
    video_sh = NamedSharding(mesh, spec.video) if has_video else None
    labels_sh = NamedSharding(mesh, spec.labels)
    batch_sh = Batch(codes=codes_sh, video=video_sh, labels=labels_sh)
    return jax.jit(step, in_shardings=(rep, batch_sh), out_shardings=rep)
