"""Variant matrix for the mesh single-step chained-dispatch pathology.

probe_mesh_dispatch.py established: plain-jit chained 15 ms, mesh
chained-unsynced ~6 s/call, mesh per-call-sync 35 ms, mesh same-input
14 ms.  Bench separately shows the mesh SCAN-8 step chains unsynced
fine (91 ms/call).  This probe discriminates the remaining variables.

Run: python scripts/probe_mesh_dispatch2.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from movenet_tpu.utils.chiplock import chip_lock

    with chip_lock("probe_mesh_dispatch2", timeout_s=900):
        _run()


def _run():
    import jax
    import jax.numpy as jnp

    import bench

    model, cfg, state0, batch0 = bench._breakdancing_setup()
    mesh, sharded, make_step = bench._mesh_train_env(model, cfg, batch0)

    def timed(name, fn, reps=6):
        t0 = time.perf_counter()
        fn(reps)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:42s} {dt * 1e3:9.1f} ms/call", flush=True)

    with mesh:
        step = make_step()
        s, m = step(state0, sharded)
        jax.block_until_ready(s)

        # f) chained, unsynced, discard metrics immediately
        def f(reps):
            nonlocal s
            for _ in range(reps):
                s, m = step(s, sharded)
                del m
            jax.block_until_ready(s)
        timed("f) chained unsynced (del metrics)", f)

        # g) chained, sync STATE only every call (metrics pending)
        def g(reps):
            nonlocal s
            for _ in range(reps):
                s, m = step(s, sharded)
                jax.block_until_ready(s)
        timed("g) chained state-synced per call", g)

        # h) chained, sync METRICS only per call (state pending)
        def h(reps):
            nonlocal s
            for _ in range(reps):
                s, m = step(s, sharded)
                m["loss"].block_until_ready()
        timed("h) chained loss-synced per call", h)

        # i) chained depth-2: sync every second call
        def i(reps):
            nonlocal s
            for k in range(reps):
                s, m = step(s, sharded)
                if k % 2 == 1:
                    jax.block_until_ready(s)
            jax.block_until_ready(s)
        timed("i) chained sync every 2nd call", i)

        # j) scan8 chained unsynced (bench's fast case, reproduce)
        scan_step = make_step(n_scan=8)
        batches8 = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (8,) + x.shape),
            sharded)
        s2, m2 = scan_step(state0, batches8)
        jax.block_until_ready(s2)

        def j(reps):
            nonlocal s2
            for _ in range(reps):
                s2, m2 = scan_step(s2, batches8)
            jax.block_until_ready(s2)
        timed("j) scan8 chained unsynced (per call)", j)


if __name__ == "__main__":
    main()
