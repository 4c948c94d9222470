"""Component-level timing of the fused train step on the real chip.

Breaks the breakdancing train step (bench.py secondary metric) into its
pieces so kernel work can be attributed.  Every timed function returns
only SCALARS: returning multi-hundred-MB pallas outputs (hsave/tfsg)
makes each queued dispatch block on HBM allocation, which adds a ~30 ms
tunnel sync per rep and wrecks the measurement.

Run:  python scripts/microbench_trunk.py [--reps 32]
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
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=32)
    args = p.parse_args()
    reps = args.reps

    import jax
    import jax.numpy as jnp

    import bench
    from movenet_tpu.models.fused import (
        _fused_trunk, _prepare_trunk, _stack_weights, fused_train_loss)
    from movenet_tpu.ops.pallas.head_loss import fused_head_loss
    from movenet_tpu.train import make_train_step

    model, cfg, state, batch = bench._breakdancing_setup()
    params = state.params
    codes, video = batch.codes, batch.video
    b, t = codes.shape
    rows = {}

    def timed(fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / reps

    # ---- full train step (state-chained like bench.py)
    step = jax.jit(make_train_step(model, cfg))

    def run_step():
        nonlocal state
        state, m = step(state, batch)
        return m["loss"]

    out = run_step()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_step()
    np.asarray(out)
    rows["full_train_step"] = (time.perf_counter() - t0) / reps

    # ---- loss fwd only
    loss_fn = jax.jit(lambda p: fused_train_loss(
        model, p, codes, video, None, True)[0])
    rows["loss_fwd_only"] = timed(loss_fn, params)

    # ---- loss fwd+bwd
    grad_fn = jax.jit(lambda p: jax.tree_util.tree_map(
        jnp.sum,
        jax.grad(lambda q: fused_train_loss(model, q, codes, video,
                                            None, True)[0])(p)))
    rows["loss_fwd_bwd"] = timed(
        lambda p: grad_fn(p)["front_cur"], params)

    # ---- trunk fwd (incl. encoders), scalar output
    trunk_fwd = jax.jit(lambda p: jnp.sum(
        _fused_trunk(model, p, codes, video, None, False)
        .astype(jnp.float32)))
    rows["trunk_fwd_incl_encoders"] = timed(trunk_fwd, params)

    trunk_fwd_bwd = jax.jit(lambda p: jnp.sum(
        jax.grad(lambda q: jnp.sum(
            _fused_trunk(model, q, codes, video, None, False)
            .astype(jnp.float32)))(p)["front_cur"]))
    rows["trunk_fwd_bwd_incl_encoders"] = timed(trunk_fwd_bwd, params)

    # ---- encoders alone (video encoder + front embed + weight packing)
    def enc(p):
        h, ctx, bw = _prepare_trunk(model, p, codes, video, None)
        st = _stack_weights(model, bw, t, tuple(model.dilations))
        return (jnp.sum(h.astype(jnp.float32))
                + jnp.sum(ctx.astype(jnp.float32)) + jnp.sum(st[1]))

    rows["encoders_fwd"] = timed(jax.jit(enc), params)
    rows["encoders_fwd_bwd"] = timed(
        jax.jit(lambda p: jnp.sum(jax.grad(enc)(p)["front_cur"])),
        params)

    # ---- head/CE alone on a realistic skip input
    rng = np.random.default_rng(0)
    skip = jnp.asarray(rng.standard_normal((b, t, 64)), jnp.bfloat16)
    targets_tb = jnp.roll(codes, -1, axis=1).T
    rf = model.receptive_fields

    def head(p, s):
        return fused_head_loss(
            s, targets_tb, p["head1"]["kernel"], p["head1"]["bias"],
            p["head2"]["kernel"], p["head2"]["bias"], rf, True, False)[0]

    rows["head_ce_fwd"] = timed(jax.jit(head), params, skip)
    rows["head_ce_fwd_bwd"] = timed(
        jax.jit(lambda p, s: jnp.sum(jax.grad(
            lambda q: head(q, s).astype(jnp.float32))(p)
            ["head1"]["kernel"])), params, skip)

    print(f"\n{'component':36s} {'ms':>8s}")
    for k, v in rows.items():
        print(f"{k:36s} {v * 1e3:8.3f}")
    d = rows
    print("\nderived:")
    print(f"{'trunk fwd (minus encoders)':36s} "
          f"{(d['trunk_fwd_incl_encoders'] - d['encoders_fwd']) * 1e3:8.3f}")
    print(f"{'trunk bwd (delta)':36s} "
          f"{(d['trunk_fwd_bwd_incl_encoders'] - d['trunk_fwd_incl_encoders']) * 1e3:8.3f}")
    print(f"{'head bwd (delta)':36s} "
          f"{(d['head_ce_fwd_bwd'] - d['head_ce_fwd']) * 1e3:8.3f}")
    print(f"{'step minus loss_fwd_bwd':36s} "
          f"{(d['full_train_step'] - d['loss_fwd_bwd']) * 1e3:8.3f}")


if __name__ == "__main__":
    main()
