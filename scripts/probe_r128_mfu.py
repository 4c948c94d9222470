"""MFU at MXU-filling geometry: the breakdancing config with R=128.

RESULTS.md attributes the 15.0% MFU record at R=64 to model geometry
(k=64 matmuls occupy half the 128-wide MXU), not to the kernels.  This
probe runs the SAME fused train pipeline with residual/skip channels
at 128 (4x the trunk FLOPs) and reports steps/s + MFU so the claim is
measured, not asserted.  Reference hot loop being scaled:
/root/reference/movenet/modules.py:67-93 (its channel count is a flag).

Run: python scripts/probe_r128_mfu.py [--chain 32] [--groups 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--groups", type=int, default=3)
    ap.add_argument("--channels", type=int, default=128)
    args = ap.parse_args()

    from movenet_tpu.utils.chiplock import chip_lock
    with chip_lock("probe_r128_mfu", timeout_s=900):
        _run(args)


def _run(args):
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench
    from movenet_tpu.config import MeshConfig, ModelConfig, \
        TrainingConfig
    from movenet_tpu.models.wavenet import make_wavenet
    from movenet_tpu.train import create_train_state, make_optimizer, \
        make_train_step
    from movenet_tpu.train.loop import Batch

    r = args.channels
    mc = ModelConfig(layer_size=3, stack_size=3, input_channels=64,
                     residual_channels=r, skip_channels=r,
                     compute_dtype="bfloat16")
    cfg = TrainingConfig(model_config=mc, optimizer="AdamW",
                         learning_rate=3e-4, scheduler=None,
                         batch_size=2, fused_blocks=True,
                         mesh=MeshConfig(data=1, seq=1))
    model = make_wavenet(mc)
    rng = np.random.default_rng(0)
    batch = Batch(
        codes=jnp.asarray(rng.integers(0, 64, size=(2, 160_000)),
                          jnp.int32),
        video=jnp.asarray(rng.standard_normal((2, 160, 64, 64, 1)),
                          jnp.float32))
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0),
                               batch)

    step = jax.jit(make_train_step(model, cfg))
    t0 = time.perf_counter()
    state, m = step(state, batch)
    loss = float(np.asarray(m["loss"]))
    print(f"R={r} compile+first step {time.perf_counter()-t0:.1f}s "
          f"loss={loss:.4f}", flush=True)

    def group():
        nonlocal state, m
        for _ in range(args.chain):
            state, m = step(state, batch)
        np.asarray(m["loss"])

    best, med, worst = bench._timed_groups(group, args.groups,
                                           args.chain)
    flops = bench._train_step_model_flops(mc, 2, 160_000)
    mfu = flops / best / (bench.V5E_PEAK_TFLOPS * 1e12) * 100
    print(f"R={r}: {best*1e3:.2f} ms/step ({1/best:.1f} steps/s)  "
          f"model {flops/1e9:.1f} GFLOP/step  MFU {mfu:.2f}%  "
          f"spread [{best*1e3:.2f}, {med*1e3:.2f}, {worst*1e3:.2f}] ms",
          flush=True)


if __name__ == "__main__":
    main()
