"""Canonical configuration for movenet_tpu.

One config module, one source of truth.  The reference repo carried two
diverged copies of its config (movenet/config.py:11-94 and an embedded
older copy at movenet/trainer.py:61-109); here the full union of fields
lives in a single place with JSON round-trip and an argparse CLI that
preserves the reference's public flag surface (movenet/config.py:149-240)
while adding TPU-native knobs (mesh shape, dtype policy, remat).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, List, Optional


@dataclass
class ModelConfig:
    """WaveNet architecture hyperparameters (reference: config.py:11-18)."""

    layer_size: int = 2
    stack_size: int = 2
    input_channels: int = 256
    residual_channels: int = 16
    skip_channels: int = 16
    context_in_channels: int = 1

    # Canonical sequence geometry (reference: wavenet.py:27-28).  The
    # audio:video ratio must be a power of UPSAMPLE_STRIDE (10) for the
    # learned-upsampler schedule; non-canonical values are used by tests
    # and small synthetic datasets.
    max_audio_frames: int = 160_000
    max_video_frames: int = 160

    # Global (dance-category) conditioning: number of classes for the
    # learned global embedding; 0 disables.  The reference planned this
    # but never built it (wavenet.py:73 "🚧 add global conditioning");
    # the dataset layer has always produced the category labels
    # (dataset.py:117-119 "use the class label as global context").
    global_classes: int = 0

    # Video (local) conditioning capability: when False the per-block
    # context convs are never created (no dead params / optimizer state
    # / weight decay for context-free models).  The trainer clears this
    # automatically when --use_video is off.
    use_context: bool = True

    # --- behavior flags -------------------------------------------------
    # The reference's forward returns softmax probabilities by default and
    # computes cross-entropy on those probabilities (wavenet.py:189-191,
    # trainer.py:128-129).  ``parity_softmax_output=True`` reproduces that
    # exact loss surface; False gives the mathematically standard
    # CE-on-logits formulation.
    parity_softmax_output: bool = True

    # Compute dtype: "bfloat16" for TPU speed, "float32" for bit-parity
    # testing.  Parameters are always stored in float32.
    compute_dtype: str = "bfloat16"

    # Rematerialize each gated residual block in the backward pass
    # (trades FLOPs for HBM; needed for layer_size=14 / 160k-sample runs).
    remat: bool = False
    # Fused-trunk VJP memory strategy: "auto" (default), "save",
    # "replay" (no per-layer h saves; ~half the activation HBM), or
    # "recompute" (ring snapshots only).  See
    # ops/pallas/stack_kernel.resolve_strategy; remat=True implies
    # recompute when unset.
    fused_strategy: Optional[str] = None

    @property
    def dilations(self) -> List[int]:
        """Per-layer dilation schedule: ``2^0..2^(L-1)`` repeated S times
        (reference: modules.py:112-117)."""
        return [
            2 ** l
            for _ in range(self.stack_size)
            for l in range(self.layer_size)
        ]

    @property
    def receptive_fields(self) -> int:
        """Receptive field in samples (reference: wavenet.py:125-134)."""
        return sum(self.dilations) + self.stack_size


@dataclass
class MeshConfig:
    """SPMD device-mesh layout.

    The reference's only parallelism is single-node DDP over NCCL
    (trainer.py:619-644).  Here parallelism is a mesh: ``data`` shards the
    batch (gradient psum over ICI), ``seq`` optionally shards the audio
    time axis with receptive-field halo exchange.
    """

    data: int = -1  # -1: use all devices on the data axis
    seq: int = 1

    def axis_sizes(self, n_devices: int) -> tuple:
        data = self.data if self.data > 0 else max(1, n_devices // self.seq)
        return (data, self.seq)


@dataclass
class TrainingConfig:
    """Training-run configuration (union of reference config.py:21-94 and
    trainer.py:61-109, plus TPU-native fields)."""

    model_config: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # --- core training loop ---------------------------------------------
    batch_size: int = 3
    val_batch_size: int = 3
    checkpoint_every: int = 25
    optimizer: str = "AdamW"
    learning_rate: float = 0.0001
    momentum: float = 0.9
    accumulation_steps: int = 1
    num_workers: int = 0
    val_num_workers: int = 0
    pin_memory: bool = False  # accepted for CLI parity; no-op on TPU
    weight_decay: float = 0.0
    n_epochs: int = 100
    n_steps_per_epoch: Optional[int] = None
    use_video: bool = True
    # route the training forward/backward through the Pallas fused
    # gated-block kernels (requires sequence length % 128 == 0)
    fused_blocks: bool = False
    # run the fused kernels through the Pallas INTERPRETER on non-TPU
    # backends (multi-chip dryruns / CPU equivalence tests of the
    # fused+shard_map composition); no effect on TPU
    fused_interpret: bool = False
    gradient_clipping: Optional[float] = 0.0
    # run the optimizer over one concatenated parameter vector (same
    # math, ~10x fewer device ops; see train/optim.py:flatten_transform)
    flat_optimizer: bool = True
    # run N optimizer steps per jitted call via lax.scan (amortizes
    # host dispatch; metrics/logging granularity becomes N steps)
    scan_steps: int = 1
    batch_subsample_frac: Optional[float] = None
    val_batch_subsample_frac: Optional[float] = None
    seed: int = 0

    # --- sample generation ------------------------------------------------
    generate_n_samples: Optional[int] = None
    generate_temperature: float = 1.0

    # --- LR schedule (reference: config.py:50-72) -------------------------
    scheduler: Optional[str] = "OneCycleLR"
    lr_pct_start: float = 0.45              # OneCycleLR
    base_learning_rate: float = 0.0003      # CyclicLR
    scheduler_step_size_up: int = 1000
    scheduler_step_size_down: Optional[int] = None
    scheduler_cyclic_mode: str = "triangular"
    scheduler_cyclic_gamma: float = 1.0
    scheduler_cycle_momentum: bool = False
    max_learning_rate: float = 0.003        # OneCycleLR / CyclicLR
    scheduler_step_size: int = 10           # StepLR
    scheduler_step_gamma: float = 0.1       # StepLR / MultiStepLR
    scheduler_milestones: Optional[List[int]] = None

    # --- distributed ------------------------------------------------------
    # Kept for CLI parity with the reference (config.py:208-209); the JAX
    # runtime needs neither a backend name nor a rendezvous port on a
    # single host, and uses jax.distributed.initialize() on multi-host.
    dist_backend: Optional[str] = None
    dist_port: str = "8888"
    coordinator_address: Optional[str] = None  # multi-host JAX init
    num_processes: Optional[int] = None
    process_id: Optional[int] = None

    # --- model IO -----------------------------------------------------------
    pretrained_model_path: Optional[Path] = None
    # warm-start from another local run by name (the reference resolved
    # this against grid.ai artifact storage, trainer.py:709-728; here it
    # resolves a sibling run directory under model_output_path's parent
    # or an absolute/CWD-relative directory, and fails loudly otherwise)
    pretrained_run_exp_name: Optional[str] = None
    model_output_path: Path = Path("models")
    # resume from the latest checkpoint under model_output_path if any
    # (the reference delegated this to grid.ai --auto_resume,
    # experiments/02_kinetics_breakdancing.mk:70-92)
    auto_resume: bool = False

    # --- logging --------------------------------------------------------
    tensorboard_dir: Path = Path("tensorboard_logs")
    # materialize + write per-step scalars every N steps; off-cadence
    # steps stay fully async on device (pulling every metric to the host
    # each step forces a device sync that defeats the prefetch overlap)
    log_every_n_steps: int = 50
    log_samples_every: Optional[int] = None
    logger: Optional[str] = None  # None | "wandb" | "tensorboard" | "jsonl"
    wandb_project: str = "dance2music-tpu"
    log_video: bool = False

    # ---------------------------------------------------------------- JSON
    def to_dict(self) -> dict:
        def enc(v: Any):
            if isinstance(v, Path):
                return str(v)
            if dataclasses.is_dataclass(v) and not isinstance(v, type):
                return {k: enc(x) for k, x in dataclasses.asdict(v).items()}
            if isinstance(v, dict):
                return {k: enc(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [enc(x) for x in v]
            return v

        return {
            f.name: enc(getattr(self, f.name))
            for f in dataclasses.fields(self)
        }

    def to_json(self, **kwargs) -> str:
        return json.dumps(self.to_dict(), **kwargs)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainingConfig":
        d = dict(d)
        model = d.pop("model_config", {}) or {}
        mesh = d.pop("mesh", {}) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        clean = {k: v for k, v in d.items() if k in known}
        for key in ("pretrained_model_path", "model_output_path",
                    "tensorboard_dir"):
            if clean.get(key) is not None:
                clean[key] = Path(clean[key])
        model_known = {f.name for f in dataclasses.fields(ModelConfig)}
        mesh_known = {f.name for f in dataclasses.fields(MeshConfig)}
        return cls(
            model_config=ModelConfig(
                **{k: v for k, v in model.items() if k in model_known}),
            mesh=MeshConfig(
                **{k: v for k, v in mesh.items() if k in mesh_known}),
            **clean,
        )

    @classmethod
    def from_json(cls, s: str) -> "TrainingConfig":
        return cls.from_dict(json.loads(s))

    def save(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(self.to_json(indent=2))

    @classmethod
    def load(cls, path: Path) -> "TrainingConfig":
        return cls.from_json(Path(path).read_text())


def _bool_flag(x: str) -> bool:
    return bool(int(x))


def arg_parser() -> argparse.ArgumentParser:
    """CLI surface compatible with the reference (config.py:149-240)."""
    p = argparse.ArgumentParser(description="movenet_tpu trainer")
    p.add_argument("--dataset", type=str)
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--val_batch_size", type=int, default=3)
    p.add_argument("--optimizer", type=str, default="AdamW")
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--scheduler", type=str, default=None)
    p.add_argument("--lr_pct_start", type=float, default=0.45)
    p.add_argument("--base_learning_rate", type=float, default=0.0003)
    p.add_argument("--scheduler_step_size_up", type=int, default=1000)
    p.add_argument("--scheduler_step_size_down", type=int, default=None)
    p.add_argument("--scheduler_cyclic_mode", type=str, default="triangular")
    p.add_argument("--scheduler_cyclic_gamma", type=float, default=1.0)
    p.add_argument("--scheduler_cycle_momentum", type=_bool_flag,
                   default=False)
    p.add_argument("--max_learning_rate", type=float, default=0.003)
    p.add_argument("--scheduler_step_size", type=int, default=10)
    p.add_argument("--scheduler_step_gamma", type=float, default=0.1)
    p.add_argument(
        "--scheduler_milestones",
        type=lambda x: [int(i) for i in json.loads(x)],
        default=None,
    )
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--val_num_workers", type=int, default=1)
    p.add_argument("--pin_memory", type=_bool_flag, default=False)
    p.add_argument("--generate_n_samples", type=int, default=None)
    p.add_argument("--generate_temperature", type=float, default=1.0)
    p.add_argument("--n_epochs", type=int, default=10)
    p.add_argument("--n_steps_per_epoch", type=int, default=None)
    p.add_argument("--use_video", type=_bool_flag, default=True)
    p.add_argument("--batch_subsample_frac", type=float, default=None)
    p.add_argument("--val_batch_subsample_frac", type=float, default=None)
    p.add_argument("--gradient_clipping", type=float, default=0.0)
    p.add_argument("--checkpoint_every", type=int, default=1)
    p.add_argument("--input_channels", type=int, default=16)
    p.add_argument("--residual_channels", type=int, default=16)
    p.add_argument("--skip_channels", type=int, default=8)
    p.add_argument("--layer_size", type=int, default=3)
    p.add_argument("--stack_size", type=int, default=3)
    p.add_argument("--global_classes", type=int, default=0)
    p.add_argument("--fused_blocks", type=_bool_flag, default=False)
    p.add_argument("--flat_optimizer", type=_bool_flag, default=True)
    p.add_argument("--scan_steps", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    # distributed (reference flags kept; TPU-native additions below)
    p.add_argument("--dist_backend", type=str, default=None)
    p.add_argument("--dist_port", type=str, default="8888")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_seq", type=int, default=1)
    # TPU-native model knobs
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--parity_softmax_output", type=_bool_flag, default=True)
    p.add_argument("--remat", type=_bool_flag, default=False)
    p.add_argument("--fused_strategy", type=str, default=None,
                   choices=["auto", "save", "replay", "recompute"])
    # model IO
    p.add_argument(
        "--pretrained_model_path",
        type=lambda x: None if not x else Path(x),
        default=None,
    )
    p.add_argument(
        "--pretrained_run_exp_name",
        type=lambda x: None if not x else x,
        default=None,
    )
    p.add_argument("--model_output_path", type=Path, default=None)
    p.add_argument("--auto_resume", type=_bool_flag, default=False)
    p.add_argument("--training_logs_path", type=Path,
                   default=Path("training_logs"))
    # logging
    p.add_argument("--logger", default=None, type=str,
                   choices=["wandb", "tensorboard", "jsonl"])
    p.add_argument("--log_every_n_steps", type=int, default=50)
    p.add_argument("--log_samples_every", type=int, default=None)
    p.add_argument("--log_video", type=_bool_flag, default=False)
    p.add_argument("--wandb_api_key", type=str, default="")
    p.add_argument("--wandb_project", type=str, default="dance2music-tpu")
    return p


def config_from_args(args: argparse.Namespace) -> TrainingConfig:
    """Map parsed CLI args onto a TrainingConfig
    (reference: config.py:97-146)."""
    from datetime import datetime

    out_path = args.model_output_path
    if out_path is None:
        out_path = Path("models") / datetime.now().strftime("%Y%m%d%H%M%S")

    return TrainingConfig(
        model_config=ModelConfig(
            layer_size=args.layer_size,
            stack_size=args.stack_size,
            input_channels=args.input_channels,
            residual_channels=args.residual_channels,
            skip_channels=args.skip_channels,
            compute_dtype=args.compute_dtype,
            parity_softmax_output=args.parity_softmax_output,
            remat=args.remat,
            fused_strategy=args.fused_strategy,
            global_classes=args.global_classes,
        ),
        mesh=MeshConfig(data=args.mesh_data, seq=args.mesh_seq),
        batch_size=args.batch_size,
        val_batch_size=args.val_batch_size,
        checkpoint_every=args.checkpoint_every,
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        accumulation_steps=args.accumulation_steps,
        num_workers=args.num_workers,
        val_num_workers=args.val_num_workers,
        pin_memory=args.pin_memory,
        n_epochs=args.n_epochs,
        n_steps_per_epoch=args.n_steps_per_epoch,
        use_video=args.use_video,
        fused_blocks=args.fused_blocks,
        flat_optimizer=args.flat_optimizer,
        scan_steps=args.scan_steps,
        gradient_clipping=args.gradient_clipping,
        batch_subsample_frac=args.batch_subsample_frac,
        val_batch_subsample_frac=args.val_batch_subsample_frac,
        seed=args.seed,
        generate_n_samples=args.generate_n_samples,
        generate_temperature=args.generate_temperature,
        scheduler=args.scheduler,
        lr_pct_start=args.lr_pct_start,
        base_learning_rate=args.base_learning_rate,
        scheduler_step_size_up=args.scheduler_step_size_up,
        scheduler_step_size_down=args.scheduler_step_size_down,
        scheduler_cyclic_mode=args.scheduler_cyclic_mode,
        scheduler_cyclic_gamma=args.scheduler_cyclic_gamma,
        scheduler_cycle_momentum=args.scheduler_cycle_momentum,
        max_learning_rate=args.max_learning_rate,
        scheduler_step_size=args.scheduler_step_size,
        scheduler_step_gamma=args.scheduler_step_gamma,
        scheduler_milestones=args.scheduler_milestones,
        dist_backend=args.dist_backend,
        dist_port=args.dist_port,
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
        pretrained_model_path=(
            args.pretrained_model_path
            if args.pretrained_model_path else None
        ),
        pretrained_run_exp_name=args.pretrained_run_exp_name,
        model_output_path=out_path,
        auto_resume=args.auto_resume,
        tensorboard_dir=args.training_logs_path,
        log_every_n_steps=args.log_every_n_steps,
        log_samples_every=args.log_samples_every,
        logger=args.logger,
        wandb_project=args.wandb_project,
        log_video=args.log_video,
    )
