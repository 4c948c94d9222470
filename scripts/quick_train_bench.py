"""Quick train-step timing + fused-vs-XLA correctness on the real chip.

Times the full breakdancing train step (bench.py protocol) plus the
trunk fwd / fwd+bwd deltas, and checks the fused pipeline against the
unfused XLA path (loss / grad_norm / accuracy within 2e-3).

Run: python scripts/quick_train_bench.py [--reps 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()
    reps = args.reps

    from movenet_tpu.utils.chiplock import chip_lock
    with chip_lock("quick_train_bench", timeout_s=900):
        _run(args, reps)


def _run(args, reps):
    import jax
    import jax.numpy as jnp

    import bench
    from movenet_tpu.models.fused import _fused_trunk
    from movenet_tpu.train import make_train_step

    model, cfg, state, batch = bench._breakdancing_setup()
    params = state.params
    codes, video = batch.codes, batch.video

    step = jax.jit(make_train_step(model, cfg))

    def time_chained():
        nonlocal state
        s, m = step(state, batch)
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for _ in range(reps):
            s, m = step(s, batch)
        np.asarray(m["loss"])
        return (time.perf_counter() - t0) / reps

    dt = time_chained()
    print(f"full_train_step        {dt * 1e3:8.3f} ms "
          f"({1 / dt:6.1f} steps/s)", flush=True)

    trunk_fwd = jax.jit(lambda p: jnp.sum(
        _fused_trunk(model, p, codes, video, None, False)
        .astype(jnp.float32)))
    trunk_fb = jax.jit(lambda p: jnp.sum(
        jax.grad(lambda q: jnp.sum(
            _fused_trunk(model, q, codes, video, None, False)
            .astype(jnp.float32)))(p)["front_cur"]))

    def timed(name, fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        d = (time.perf_counter() - t0) / reps
        print(f"{name:22s} {d * 1e3:8.3f} ms", flush=True)
        return d

    timed("trunk_fwd(+enc,+disp)", trunk_fwd, params)
    timed("trunk_fwd_bwd", trunk_fb, params)

    if not args.skip_check:
        vals = {}
        for fused in (False, True):
            c = dataclasses.replace(cfg, fused_blocks=fused)
            st = jax.jit(make_train_step(model, c))
            s = state
            for _ in range(3):
                s, m = st(s, batch)
            vals[fused] = {k: float(m[k])
                           for k in ("loss", "grad_norm", "accuracy")}
        deltas = {k: abs(vals[True][k] - vals[False][k])
                  for k in vals[True]}
        ok = all(d < 2e-3 for d in deltas.values())
        print(f"fused-vs-xla deltas: "
              f"{ {k: round(v, 7) for k, v in deltas.items()} } "
              f"ok={ok}")


if __name__ == "__main__":
    main()
