"""Epoch driver: the one canonical trainer.

Replaces both reference trainers (the 787-line legacy loop in
trainer.py and the Lightning module in pytorch_lightning_trainer.py)
with a single SPMD loop: config -> data -> pjit train/eval steps ->
checkpoints -> metrics -> sample export.

Flow per epoch (reference trainer.py:295-453 shape):
  train loop (optional step cap) -> validation loop -> periodic
  generation + sample export -> periodic checkpoint (+ final).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from movenet_tpu.config import TrainingConfig
from movenet_tpu.data.pipeline import DataLoader, get_dataloader
from movenet_tpu.models.sampler import fast_generate
from movenet_tpu.models.wavenet import WaveNet, make_wavenet
from movenet_tpu.parallel import (
    create_mesh,
    initialize_distributed,
    make_parallel_eval_step,
    make_parallel_scan_train_step,
    make_parallel_train_step,
    shard_batch,
    sync_global_devices,
)
from movenet_tpu.train.checkpoint import CheckpointManager
from movenet_tpu.train.loop import Batch, create_train_state
from movenet_tpu.train.optim import make_optimizer, make_schedule
from movenet_tpu.utils.observability import make_writer
from movenet_tpu.utils.samples import export_samples

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Graceful preemption handling (the failure-tolerance piece the
    reference delegated to grid.ai spot auto-resume, SURVEY §5.3):
    SIGTERM/SIGINT set a flag; the epoch loop checkpoints and exits
    cleanly at the next step boundary, and --auto_resume continues the
    run after rescheduling."""

    def __init__(self, install: bool = True):
        import signal

        self.requested = False
        self._prev = {}
        if not install:
            return
        import threading
        if threading.current_thread() is not threading.main_thread():
            return  # signals only installable from the main thread
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # pragma: no cover
                pass

    def _handler(self, signum, frame):
        logger.warning("received signal %s: will checkpoint and exit "
                       "at the next step boundary", signum)
        self.requested = True

    def restore(self):
        import signal

        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):  # pragma: no cover
                pass


def _device_prefetch(batches, mesh, depth: int = 2):
    """Move host batches onto the mesh one step ahead of compute so the
    H2D transfer overlaps the previous train step."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        # never block forever: the consumer may stop early (step caps,
        # preemption) and the producer must not leak blocked threads
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not _put(shard_batch(mesh, b)):
                    return
        except Exception as e:  # surface on the consumer side
            _put(e)
        finally:
            _put(None)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()


def _stack_batches(bs) -> Batch:
    return Batch(
        codes=np.stack([b.codes for b in bs]),
        video=(None if bs[0].video is None
               else np.stack([b.video for b in bs])),
        labels=(None if bs[0].labels is None
                else np.stack([b.labels for b in bs])),
        codes_pack=(None if bs[0].codes_pack is None
                    else np.stack([b.codes_pack for b in bs])),
    )


def _chunk_batches(batches, n: int, max_steps: Optional[int] = None):
    """Group host batches into stacked (n, ...) scan chunks; the tail
    that doesn't fill a chunk (epoch end / step cap) is yielded as
    plain per-step batches."""
    buf = []
    produced = 0
    for b in batches:
        if max_steps is not None and produced >= max_steps:
            break
        buf.append(b)
        produced += 1
        if len(buf) == n:
            yield _stack_batches(buf)
            buf = []
    for b in buf:
        yield b


def _mean_metrics(metrics_list) -> Dict[str, float]:
    if not metrics_list:
        return {}
    keys = metrics_list[0].keys()
    return {k: float(np.mean([float(m[k]) for m in metrics_list]))
            for k in keys}


def _resolve_run_dir(exp_name: str, out_dir: Path) -> Path:
    """Resolve ``--pretrained_run_exp_name`` to a local run directory
    holding checkpoints (the reference downloaded grid.ai artifacts by
    experiment name, trainer.py:709-728).  Candidates: the name as a
    path, and a sibling run under out_dir's parent.  Fails loudly."""
    candidates = [Path(exp_name), out_dir.parent / exp_name]
    tried = []
    for cand in candidates:
        tried.append(str(cand))
        if not cand.is_dir():
            continue
        probe = CheckpointManager(cand)
        has_ckpt = probe.latest_step() is not None
        probe.close()
        if has_ckpt:
            return cand
    raise FileNotFoundError(
        f"pretrained_run_exp_name={exp_name!r}: no run directory with "
        f"checkpoints found (tried: {', '.join(tried)})")


def train_model(
    dataset_fp: str,
    config: TrainingConfig,
    train_loader: Optional[DataLoader] = None,
    val_loader: Optional[DataLoader] = None,
):
    """Train a WaveNet per the config; returns the final TrainState.

    ``train_loader``/``val_loader`` may be injected (tests, synthetic
    data); by default they come from the dataset tree at ``dataset_fp``.
    """
    initialize_distributed(config)
    mesh = create_mesh(config.mesh, batch_size=config.batch_size)
    logger.info("mesh: %s over %d devices", dict(mesh.shape),
                len(mesh.devices.flat))

    mc = config.model_config
    loader_kwargs = dict(
        input_channels=mc.input_channels,
        batch_size=config.batch_size,
        use_video=config.use_video,
        accumulation_steps=config.accumulation_steps,
        # host-side (T, 3B) codes pre-pack: BUILT AND DISPROVEN on v5e
        # — a jit input array pays a parameter->Mosaic retiling copy
        # that costs exactly what the in-jit pack op does (measured
        # 0.127 ms either way; s16 inputs additionally retile from
        # T(16,128)).  The mechanism stays (loader flag + Batch field +
        # fused_train_loss arg, bit-equality tested) for environments
        # where parameter layouts line up, but off by default.
        host_pack=False,
        max_audio_frames=mc.max_audio_frames,
        max_video_frames=mc.max_video_frames,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    if train_loader is None:
        train_loader = get_dataloader(
            dataset_fp, train=True, num_workers=config.num_workers,
            batch_subsample_frac=config.batch_subsample_frac,
            **loader_kwargs)
    if val_loader is None:
        vkw = dict(loader_kwargs)
        vkw.update(batch_size=config.val_batch_size,
                   accumulation_steps=1)
        val_loader = get_dataloader(
            dataset_fp, train=False, num_workers=config.val_num_workers,
            batch_subsample_frac=config.val_batch_subsample_frac,
            shuffle=False, **vkw)

    steps_per_epoch = train_loader.steps_per_epoch()
    if config.n_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, config.n_steps_per_epoch)

    # a run without video never feeds context: drop the per-block
    # context convs so they don't carry dead optimizer state/decay
    mc.use_context = mc.use_context and config.use_video
    if mc.global_classes == -1:
        # auto: one class per dataset category (the reference's planned
        # "dance-style" global conditioning, wavenet.py:73)
        mc.global_classes = max(1, len(train_loader.context_to_id))
        logger.info("global conditioning over %d classes",
                    mc.global_classes)
    model = make_wavenet(mc)
    logger.info("model receptive field: %d", model.receptive_fields)

    tx = make_optimizer(config, steps_per_epoch=steps_per_epoch)
    schedule = make_schedule(config, steps_per_epoch=steps_per_epoch)

    sample_batch = next(iter(train_loader.epoch(0)))
    state = create_train_state(model, config, tx, jax.random.PRNGKey(
        config.seed), sample_batch, lr_schedule=schedule)

    out_dir = Path(config.model_output_path)
    ckpt = CheckpointManager(out_dir)
    start_epoch = 0
    pretrained_path = config.pretrained_model_path
    if pretrained_path is None and config.pretrained_run_exp_name:
        pretrained_path = _resolve_run_dir(
            config.pretrained_run_exp_name, out_dir)
        logger.info("resolved pretrained run %r -> %s",
                    config.pretrained_run_exp_name, pretrained_path)
    if pretrained_path:
        pre = CheckpointManager(Path(pretrained_path))
        state = pre.restore(state)
        pre.close()
        logger.info("restored pretrained state (step %d) from %s",
                    int(state.step), pretrained_path)
    elif getattr(config, "auto_resume", False) and \
            ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_epoch = int(ckpt.latest_step()) + 1
        logger.info("auto-resumed at epoch %d (step %d)", start_epoch,
                    int(state.step))

    if jax.process_index() == 0:
        config.save(out_dir / "config.json")
    writer = make_writer(config)

    has_video = config.use_video
    scan_n = max(1, int(getattr(config, "scan_steps", 1)))
    with mesh:
        train_step = make_parallel_train_step(model, config, mesh,
                                              has_video=has_video)
        scan_step = None
        if scan_n > 1:
            scan_step = make_parallel_scan_train_step(
                model, config, mesh, has_video=has_video,
                n_steps=scan_n)
        eval_step = make_parallel_eval_step(model, config, mesh,
                                            has_video=has_video)
        guard = PreemptionGuard()
        log_every = max(1, config.log_every_n_steps)
        # a scan chunk carries one extra leading axis over the plain
        # (accumulation-aware) batch rank
        base_ndim = 2 + (config.accumulation_steps > 1)

        for epoch in range(start_epoch, config.n_epochs):
            t_epoch = time.perf_counter()
            # scalars stay on device between log points: float() forces
            # a device sync that would serialize dispatch and defeat the
            # prefetch overlap, so sums accumulate as (async) device
            # adds and only materialize every log_every steps
            metric_sums = None
            n_steps = 0
            t_window = time.perf_counter()
            window_start = 0
            last_log = 0
            source = train_loader.epoch(epoch)
            if scan_step is not None:
                source = _chunk_batches(source, scan_n, steps_per_epoch)
            for batch in _device_prefetch(source, mesh):
                if n_steps >= steps_per_epoch or guard.requested:
                    break
                if scan_step is not None and \
                        batch.codes.ndim == base_ndim + 1:
                    # full chunk: scan_n optimizer steps in one call;
                    # metrics come back per-step, stacked (scan_n,)
                    state, metrics = scan_step(state, batch)
                    n_steps += scan_n
                    call_sums = jax.tree.map(lambda x: x.sum(0), metrics)
                else:
                    state, metrics = train_step(state, batch)
                    n_steps += 1
                    call_sums = metrics
                # per-STEP sums (scan chunks contribute scan_n steps):
                # the epoch mean below divides by n_steps, so scanned
                # and plain calls weigh identically per optimizer step
                metric_sums = call_sums if metric_sums is None else \
                    jax.tree.map(lambda a, b: a + b, metric_sums,
                                 call_sums)
                if n_steps - last_log >= log_every or \
                        n_steps >= steps_per_epoch:
                    last_log = n_steps
                    # a scan chunk carries every per-step value: log each
                    # at its true step index (identical curve to per-step
                    # calls); float() only happens at log points
                    host = {k: np.atleast_1d(np.asarray(v))
                            for k, v in jax.device_get(metrics).items()}
                    n_in_call = len(next(iter(host.values())))
                    end_step = int(state.step)
                    now = time.perf_counter()
                    sps = ((n_steps - window_start)
                           / max(now - t_window, 1e-9))
                    t_window, window_start = now, n_steps
                    for i in range(n_in_call):
                        vals = {k: float(v[i]) for k, v in host.items()}
                        if i == n_in_call - 1:
                            vals["steps_per_sec"] = sps
                        writer.scalars("train", vals,
                                       end_step - n_in_call + 1 + i)
            train_mean = {} if metric_sums is None else {
                k: float(v) / n_steps for k, v in metric_sums.items()}

            if guard.requested:
                if jax.process_index() == 0:
                    logger.warning("preempted: checkpointing at epoch %d",
                                   epoch)
                # orbax saves are collective in multi-process JAX: every
                # process must enter save() (it gates primary-host writes
                # internally); gating on process 0 would deadlock
                ckpt.save(epoch, state)
                break

            val_metrics = []
            for batch in val_loader.epoch(epoch):
                m = eval_step(state, shard_batch(mesh, batch))
                val_metrics.append({k: float(v) for k, v in m.items()})
            if val_metrics:
                writer.scalars("val", _mean_metrics(val_metrics),
                               int(state.step))

            epoch_summary = {
                "epoch": epoch,
                "epoch_seconds": time.perf_counter() - t_epoch,
                **{f"train_{k}": v for k, v in train_mean.items()},
                **{f"val_{k}": v
                   for k, v in _mean_metrics(val_metrics).items()},
            }
            writer.scalars("epoch", epoch_summary, epoch)
            logger.info("epoch %d: %s", epoch, {
                k: round(v, 5) for k, v in epoch_summary.items()})

            if config.log_samples_every and \
                    (epoch + 1) % config.log_samples_every == 0:
                _log_samples(model, state, config, val_loader, out_dir,
                             epoch, writer)

            is_last = epoch == config.n_epochs - 1
            if is_last or (epoch + 1) % config.checkpoint_every == 0:
                # all processes: orbax save is a collective (see above)
                ckpt.save(epoch, state)
            sync_global_devices(f"epoch_{epoch}")

    guard.restore()
    ckpt.wait()
    ckpt.close()
    writer.close()
    return state


def _log_samples(model: WaveNet, state, config, val_loader, out_dir,
                 epoch, writer=None) -> None:
    """Teacher-forced predictions + free-running generation on one val
    batch, exported as WAVs (reference trainer.py:469-607)."""
    if jax.process_index() != 0:
        return
    # meta_batches carries the exact filepath per row (the tensor loader
    # substitutes failed decodes, which would shift an index-positional
    # source mapping)
    group = next(val_loader.meta_batches(), None)
    if group is None:
        return
    import jax.numpy as jnp

    codes = jnp.asarray(np.stack([ex.codes for ex in group]), jnp.int32)
    video = None
    if val_loader.use_video and group[0].video is not None:
        video = jnp.asarray(np.stack([ex.video for ex in group]))
    labels = None
    if model.global_classes:
        labels = jnp.asarray([ex.label for ex in group], jnp.int32)
    sources = [ex.filepath for ex in group]
    rf = model.receptive_fields

    logits = model.apply({"params": state.params}, codes, video, labels,
                         method=WaveNet.train_logits)
    predicted = np.asarray(jnp.argmax(logits, -1))

    n = config.generate_n_samples or codes.shape[-1]
    generated = None
    if n > rf:
        t0 = time.perf_counter()
        generated = np.asarray(fast_generate(
            model, {"params": state.params}, codes[:, :rf], int(n),
            temperature=config.generate_temperature,
            rng=jax.random.PRNGKey(epoch), video=video, labels=labels))
        logger.info("sample generation took %.2f seconds",
                    time.perf_counter() - t0)

    kinds = {"original": np.asarray(codes), "predicted": predicted}
    if generated is not None:
        kinds["generated"] = generated
    model_rate = int(16_000 * config.model_config.max_audio_frames
                     / 160_000)
    written = export_samples(out_dir / "samples", epoch, "val", kinds,
                             config.model_config.input_channels,
                             model_rate=max(model_rate, 1),
                             source_paths=sources)
    if writer is not None:
        from movenet_tpu.utils.samples import log_samples_table

        log_samples_table(writer, "val", epoch, written,
                          filepaths=sources,
                          videos=sources if config.log_video else None)
