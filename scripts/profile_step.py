"""Device-time profile of the breakdancing train step via jax.profiler.

The profiler works through the axon tunnel: start_trace/stop_trace
writes an xplane + trace.json.gz under the log dir; the device
process's "XLA Ops" thread carries per-op device durations.  This is
the ground truth for attributing step time — host-side amortized
timings include ~1 ms/step of dispatch gap and small-jit probes are
dispatch-floor-bound (see BENCH_NOTES.md).

Usage:  python scripts/profile_step.py [--scan N] [--reps 3]
"""
import argparse
import collections
import glob
import gzip
import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def parse_trace(logdir, reps):
    f = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name"))}
    tnames = {(e["pid"], e["tid"]): e["args"].get("name") for e in ev
              if e.get("ph") == "M" and e.get("name") == "thread_name"}
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and \
                tnames.get((e["pid"], e["tid"])) == "XLA Ops":
            agg[e["name"]] += e["dur"]
    tot = sum(agg.values())
    print(f"device total: {tot/reps/1000:.3f} ms/step "
          f"({len(agg)} distinct ops)")
    shown = 0
    for name, d in sorted(agg.items(), key=lambda kv: -kv[1]):
        if d / reps / 1000 < 0.01 or shown >= 20:
            break
        shown += 1
        print(f"  {d/reps/1000:8.3f} ms/step  {name[:70]}")
    rest = sum(d for _, d in sorted(agg.items(),
                                    key=lambda kv: -kv[1])[shown:])
    print(f"  {rest/reps/1000:8.3f} ms/step  (rest)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=0,
                    help="profile the scan-of-N step instead")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from movenet_tpu.utils.chiplock import chip_lock
    with chip_lock("profile_step", timeout_s=900):
        _run(args)


def _run(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.profiler

    import bench
    from movenet_tpu.train import make_scan_train_step, make_train_step

    model, cfg, state, batch = bench._breakdancing_setup()
    if args.scan:
        step = jax.jit(make_scan_train_step(model, cfg, args.scan))
        batch = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (args.scan,) + x.shape),
            batch)
        reps = args.scan  # one call = N steps
        n_calls = 1
    else:
        step = jax.jit(make_train_step(model, cfg))
        reps = args.reps
        n_calls = args.reps

    state, m = step(state, batch)
    np.asarray(m["loss"])  # compile + sync

    logdir = tempfile.mkdtemp(prefix="movenet_prof_")
    jax.profiler.start_trace(logdir)
    for _ in range(n_calls):
        state, m = step(state, batch)
    np.asarray(m["loss"])
    jax.profiler.stop_trace()
    print(f"trace: {logdir}")
    parse_trace(logdir, reps)


if __name__ == "__main__":
    main()
