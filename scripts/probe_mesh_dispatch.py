"""Why does the mesh-wrapped single train step dispatch at ~1.8 s/call
through the tunnel when the plain-jit step runs 84 steps/s and the
scanned mesh step 88 steps/s?  (First on-chip timing of the mesh path
— round 4 wired it into bench offline.)

Times, on the breakdancing config:
  a) plain jax.jit(make_train_step)        (quick_train_bench protocol)
  b) mesh step, state-chained loop          (bench _leg_train protocol)
  c) mesh step, each call block_until_ready (per-call sync)
  d) mesh step, re-dispatch with the SAME state input (no chaining)

Run: python scripts/probe_mesh_dispatch.py [--reps 8]
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

    with chip_lock("probe_mesh_dispatch", timeout_s=900):
        _run(args.reps)


def _run(reps):
    import jax

    import bench
    from movenet_tpu.train import make_train_step

    model, cfg, state0, batch0 = bench._breakdancing_setup()

    plain = jax.jit(make_train_step(model, cfg))
    s, m = plain(state0, batch0)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        s, m = plain(s, batch0)
    np.asarray(m["loss"])
    print(f"a) plain jit chained      "
          f"{(time.perf_counter() - t0) / reps * 1e3:9.1f} ms/step",
          flush=True)

    mesh, sharded, make_step = bench._mesh_train_env(model, cfg, batch0)
    with mesh:
        step = make_step()
        s, m = step(state0, sharded)
        np.asarray(m["loss"])

        t0 = time.perf_counter()
        for _ in range(reps):
            s, m = step(s, sharded)
        np.asarray(m["loss"])
        print(f"b) mesh chained           "
              f"{(time.perf_counter() - t0) / reps * 1e3:9.1f} ms/step",
              flush=True)

        t0 = time.perf_counter()
        for _ in range(reps):
            s, m = step(s, sharded)
            m["loss"].block_until_ready()
        print(f"c) mesh per-call sync     "
              f"{(time.perf_counter() - t0) / reps * 1e3:9.1f} ms/step",
              flush=True)

        s1, m1 = step(state0, sharded)
        m1["loss"].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            _, m1 = step(state0, sharded)  # same input every call
        np.asarray(m1["loss"])
        print(f"d) mesh same-input        "
              f"{(time.perf_counter() - t0) / reps * 1e3:9.1f} ms/step",
              flush=True)

        # e) is the OUTPUT state's sharding different from the input's
        # (forcing a reshard copy on every chained call)?
        leaf_in = jax.tree_util.tree_leaves(state0.params)[0]
        leaf_out = jax.tree_util.tree_leaves(s.params)[0]
        print("e) in sharding :", leaf_in.sharding)
        print("   out sharding:", leaf_out.sharding)
        print("   formats eq  :", leaf_in.format == leaf_out.format)


if __name__ == "__main__":
    main()
