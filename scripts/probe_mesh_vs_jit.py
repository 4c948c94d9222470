"""Price the 1-device-mesh shard_map composition against plain jit.

The official bench's train leg dispatches through
make_parallel_train_step over a (data=1, seq=1) mesh (the exp03
deployment composition) and has recorded ~3 ms/step MORE than the
plain-jit chained measurement of the same step
(scripts/quick_train_bench.py).  Candidate causes:

  * per-dispatch relay overhead that a longer chain amortizes
    (bench chains 8 steps per barrier; quick_train_bench chains 64)
  * real per-step device/runtime cost of the pjit+shard_map wrapping
    (input resharding, GSPMD-wrapped Mosaic custom calls)

Both paths here run the SAME reps-per-barrier chains so the numbers
are directly comparable; sweep --reps to separate fixed from per-step.

Run: python scripts/probe_mesh_vs_jit.py [--reps 8 16 64]
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
    ap.add_argument("--reps", type=int, nargs="+", default=[8, 16, 64])
    args = ap.parse_args()

    from movenet_tpu.utils.chiplock import chip_lock

    with chip_lock("probe_mesh_vs_jit", timeout_s=900):
        _run(args.reps)


def _run(reps_list):
    import jax

    import bench
    from movenet_tpu.train import make_train_step

    model, cfg, state0, batch0 = bench._breakdancing_setup()

    jstep = jax.jit(make_train_step(model, cfg))
    s, m = jstep(state0, batch0)
    np.asarray(m["loss"])

    def time_chain(step, state, batch, reps):
        s, m = step(state, batch)
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for _ in range(reps):
            s, m = step(s, batch)
        np.asarray(m["loss"])
        return (time.perf_counter() - t0) / reps

    for reps in reps_list:
        best = min(time_chain(jstep, state0, batch0, reps)
                   for _ in range(3))
        print(f"plain jit   reps={reps:3d}  {best * 1e3:8.3f} ms/step",
              flush=True)

    mesh, sharded, make_step = bench._mesh_train_env(model, cfg, batch0)
    with mesh:
        mstep = make_step()
        for reps in reps_list:
            best = min(time_chain(mstep, state0, sharded, reps)
                       for _ in range(3))
            print(f"mesh pjit   reps={reps:3d}  {best * 1e3:8.3f} "
                  f"ms/step", flush=True)


if __name__ == "__main__":
    main()
