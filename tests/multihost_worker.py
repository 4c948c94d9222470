"""Worker process for the two-process multi-host test (not a test file).

Drives the REAL multi-host path: jax.distributed.initialize via
initialize_distributed, per-process loader-style batch shards,
shard_batch's host_local_array_to_global_array branch, and the pjit'd
train step over a (data, seq) mesh spanning both processes.  This is
the TPU-native analogue of the reference's never-tested
dist_train_model (reference trainer.py:619-644).

Usage: python multihost_worker.py <port> <process_id> <out_json>
"""

import json
import os
import sys

# the worker is spawned as a bare script: its sys.path[0] is tests/,
# so the repo root must be added for `import movenet_tpu` to resolve
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    port, pid, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from movenet_tpu.models.wavenet import make_wavenet
    from movenet_tpu.parallel import (
        create_mesh,
        initialize_distributed,
        local_batch_size,
        make_parallel_train_step,
        shard_batch,
        sync_global_devices,
    )
    from movenet_tpu.train import create_train_state, make_optimizer
    from movenet_tpu.train.loop import Batch
    from movenet_tpu.train.optim import make_schedule

    config = build_config(port)
    config.process_id = pid
    initialize_distributed(config)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    model = make_wavenet(config.model_config)
    mesh = create_mesh(config.mesh)
    assert mesh.shape == {"data": 4, "seq": 2}, mesh.shape
    local_b = local_batch_size(GLOBAL_BATCH, mesh)
    assert local_b == GLOBAL_BATCH // 2, local_b

    # per-process shard of the deterministic global batch: the same rows
    # a sharded ClipIndex would feed this process
    step_batches = [
        Batch(
            codes=b.codes[:, pid * local_b:(pid + 1) * local_b],
            video=b.video[:, pid * local_b:(pid + 1) * local_b],
            labels=b.labels[:, pid * local_b:(pid + 1) * local_b],
        )
        for b in global_batches()
    ]

    tx = make_optimizer(config, steps_per_epoch=4)
    schedule = make_schedule(config, steps_per_epoch=4)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0),
                               step_batches[0], lr_schedule=schedule)

    losses, grad_norms = [], []
    with mesh:
        step_fn = make_parallel_train_step(model, config, mesh,
                                           has_video=True)
        for b in step_batches:
            state, metrics = step_fn(state, shard_batch(mesh, b))
            losses.append(float(metrics["loss"]))
            grad_norms.append(float(metrics["grad_norm"]))
    sync_global_devices("multihost_test_done")

    with open(out_path, "w") as fh:
        json.dump({
            "process_id": pid,
            "process_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count(),
            "local_batch": local_b,
            "losses": losses,
            "grad_norms": grad_norms,
        }, fh)


GLOBAL_BATCH = 8
T = 1000  # audio:video ratio must be a power of the upsample stride (10)
N_STEPS = 2


def build_config(port: int = 0):
    """Deterministic config shared by workers and the in-test oracle."""
    from movenet_tpu.config import MeshConfig, ModelConfig, TrainingConfig

    model_cfg = ModelConfig(
        layer_size=3, stack_size=2, input_channels=64,
        residual_channels=16, skip_channels=16,
        compute_dtype="float32", global_classes=3,
        max_audio_frames=T, max_video_frames=1)
    return TrainingConfig(
        model_config=model_cfg,
        mesh=MeshConfig(data=4, seq=2),
        optimizer="AdamW", learning_rate=1e-3, weight_decay=0.01,
        scheduler="OneCycleLR", max_learning_rate=3e-3, n_epochs=1,
        accumulation_steps=2, gradient_clipping=1.0,
        coordinator_address=f"localhost:{port}" if port else None,
        num_processes=2 if port else None,
        process_id=None,  # workers pass it explicitly below
    )


def global_batches():
    """The deterministic global batch stream both workers shard."""
    import numpy as np

    from movenet_tpu.train.loop import Batch

    rng = np.random.default_rng(0)
    out = []
    for _ in range(N_STEPS):
        out.append(Batch(
            codes=rng.integers(
                0, 64, size=(2, GLOBAL_BATCH, T)).astype(np.int32),
            video=rng.standard_normal(
                (2, GLOBAL_BATCH, 1, 64, 64, 1)).astype(np.float32),
            labels=rng.integers(
                0, 3, size=(2, GLOBAL_BATCH)).astype(np.int32),
        ))
    return out


if __name__ == "__main__":
    main()
