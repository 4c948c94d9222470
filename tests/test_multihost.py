"""Two-process multi-host training over localhost (Gloo collectives):
the shard_batch host_local_array_to_global_array branch,
initialize_distributed, and local_batch_size — matched bit-for-bit
against the single-process 8-device oracle.  The TPU-native analogue of
the reference's never-exercised dist_train_model
(reference trainer.py:619-644)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_oracle():
    """Same model/config/batches on this process's 8 virtual devices."""
    from movenet_tpu.parallel import (
        create_mesh,
        make_parallel_train_step,
        shard_batch,
    )
    from movenet_tpu.models.wavenet import make_wavenet
    from movenet_tpu.train import create_train_state, make_optimizer
    from movenet_tpu.train.optim import make_schedule
    from tests.multihost_worker import build_config, global_batches

    config = build_config(port=0)
    model = make_wavenet(config.model_config)
    batches = global_batches()
    tx = make_optimizer(config, steps_per_epoch=4)
    schedule = make_schedule(config, steps_per_epoch=4)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0),
                               batches[0], lr_schedule=schedule)
    mesh = create_mesh(config.mesh)
    losses, grad_norms = [], []
    with mesh:
        step_fn = make_parallel_train_step(model, config, mesh,
                                           has_video=True)
        for b in batches:
            state, metrics = step_fn(state, shard_batch(mesh, b))
            losses.append(float(metrics["loss"]))
            grad_norms.append(float(metrics["grad_norm"]))
    return losses, grad_norms


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker_{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out (deadlock?)")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    for r in results:
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["local_batch"] == 4
    # replicated metrics must agree exactly across processes
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["grad_norms"] == results[1]["grad_norms"]

    exp_losses, exp_grad_norms = _single_process_oracle()
    np.testing.assert_allclose(results[0]["losses"], exp_losses,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(results[0]["grad_norms"], exp_grad_norms,
                               rtol=1e-5, atol=1e-7)
