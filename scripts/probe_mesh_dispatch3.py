"""Protocol validation for timing chained mesh steps on the relay.

probe2 showed block_until_ready early-returns (0.1-0.3 ms "synced"
calls) while chained-unsynced dispatch pays seconds per call.  Here
every variant ends in np.asarray (a real barrier: data must move), so
the TOTAL time is trustworthy:

  A) chained, per-call block_until_ready(state), final np.asarray
  B) chained, fully unsynced, final np.asarray
  C) same-input repeated, final np.asarray
  D) chained, per-call np.asarray(loss) (hard sync per call)
  E) scan8 same-input repeated, final np.asarray

Run: python scripts/probe_mesh_dispatch3.py [--reps 8]
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
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from movenet_tpu.utils.chiplock import chip_lock

    with chip_lock("probe_mesh_dispatch3", timeout_s=900):
        _run(args.reps)


def _run(reps):
    import jax
    import jax.numpy as jnp

    import bench

    model, cfg, state0, batch0 = bench._breakdancing_setup()
    mesh, sharded, make_step = bench._mesh_train_env(model, cfg, batch0)

    with mesh:
        step = make_step()
        s0, m0 = step(state0, sharded)
        np.asarray(m0["loss"])

        def run(name, fn):
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / reps
            print(f"{name:44s} {dt * 1e3:9.1f} ms/step", flush=True)

        def a():
            s, m = s0, m0
            for _ in range(reps):
                s, m = step(s, sharded)
                jax.block_until_ready(s)
            np.asarray(m["loss"])
        run("A) chained + per-call bur(state)", a)

        def b():
            s, m = s0, m0
            for _ in range(reps):
                s, m = step(s, sharded)
            np.asarray(m["loss"])
        run("B) chained unsynced", b)

        def c():
            m = m0
            for _ in range(reps):
                _, m = step(s0, sharded)
            np.asarray(m["loss"])
        run("C) same-input repeated", c)

        def d():
            s, m = s0, m0
            for _ in range(reps):
                s, m = step(s, sharded)
                np.asarray(m["loss"])
        run("D) chained + per-call asarray(loss)", d)

        scan_step = make_step(n_scan=8)
        batches8 = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (8,) + x.shape),
            sharded)
        s8, m8 = scan_step(state0, batches8)
        np.asarray(m8["loss"])

        def e():
            m = m8
            for _ in range(max(1, reps // 4)):
                _, m = scan_step(s8, batches8)
            np.asarray(m["loss"])
        t0 = time.perf_counter()
        e()
        dt = (time.perf_counter() - t0) / max(1, reps // 4) / 8
        print(f"{'E) scan8 same-input (per opt step)':44s} "
              f"{dt * 1e3:9.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
