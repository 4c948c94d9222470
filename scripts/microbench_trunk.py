"""Component-level timing of the fused train step on the real chip.

Breaks the breakdancing train step (bench.py secondary metric) into its
pieces so kernel work can be attributed: trunk fwd, trunk fwd+bwd,
head/CE fwd(+bwd), video encoder, front embedding, optimizer update,
and the full step.  Uses the amortized-dispatch timing protocol from
bench.py (the axon tunnel adds ~30 ms per sync; dispatch `reps`
serialized calls and transfer once).

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


def timed(fn, reps):
    out = fn()
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(tree):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf)
        break
    else:
        return
    # one transfer is enough to drain the queue (serialized device)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from movenet_tpu.models.fused import (
        _front_embed, _fused_trunk, _prepare_trunk, _stack_weights,
        fused_train_loss)
    from movenet_tpu.models.wavenet import WaveNet
    from movenet_tpu.ops.pallas.head_loss import fused_head_loss
    from movenet_tpu.train import make_train_step

    model, cfg, state, batch = bench._breakdancing_setup()
    params = state.params
    codes, video = batch.codes, batch.video
    b, t = codes.shape
    rows = {}
    reps = args.reps

    # ---- full train step
    step = jax.jit(make_train_step(model, cfg))
    rows["full_train_step"] = timed(lambda: step(state, batch)[1]["loss"],
                                    reps)

    # ---- fused loss fwd only (trunk + head, no grad)
    loss_fn = jax.jit(lambda p: fused_train_loss(model, p, codes, video,
                                                 None, True)[0])
    rows["loss_fwd_only"] = timed(lambda: loss_fn(params), reps)

    # ---- fused loss fwd+bwd (no optimizer)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: fused_train_loss(model, p, codes, video, None,
                                   True)[0]))
    rows["loss_fwd_bwd"] = timed(lambda: grad_fn(params)[0], reps)

    # ---- trunk alone (fwd), with encoders included then separated
    @jax.jit
    def trunk_fwd(p):
        return _fused_trunk(model, p, codes, video, None, False)

    rows["trunk_fwd_incl_encoders"] = timed(lambda: trunk_fwd(params),
                                            reps)

    @jax.jit
    def trunk_fwd_bwd(p):
        def f(p):
            s = _fused_trunk(model, p, codes, video, None, False)
            return jnp.sum(s.astype(jnp.float32))
        return jax.grad(f)(p)

    rows["trunk_fwd_bwd_incl_encoders"] = timed(
        lambda: trunk_fwd_bwd(params), reps)

    # ---- encoders alone: video + front embed + weight packing
    @jax.jit
    def encoders(p):
        h, ctx, bw = _prepare_trunk(model, p, codes, video, None)
        st = _stack_weights(model, bw, t, tuple(model.dilations))
        return h, ctx, st[1]

    rows["encoders_fwd"] = timed(lambda: encoders(params), reps)

    @jax.jit
    def encoders_bwd(p):
        def f(p):
            h, ctx, bw = _prepare_trunk(model, p, codes, video, None)
            st = _stack_weights(model, bw, t, tuple(model.dilations))
            return (jnp.sum(h.astype(jnp.float32))
                    + jnp.sum(ctx.astype(jnp.float32))
                    + jnp.sum(st[1]))
        return jax.grad(f)(p)

    rows["encoders_fwd_bwd"] = timed(lambda: encoders_bwd(params), reps)

    # ---- head/CE alone on a realistic skip input
    rng = np.random.default_rng(0)
    skip = jnp.asarray(rng.standard_normal((b, t, 64)), jnp.bfloat16)
    targets_tb = jnp.roll(codes, -1, axis=1).T
    rf = model.receptive_fields

    @jax.jit
    def head_fwd(p, skip):
        return fused_head_loss(
            skip, targets_tb, p["head1"]["kernel"], p["head1"]["bias"],
            p["head2"]["kernel"], p["head2"]["bias"], rf, True, False)[0]

    rows["head_ce_fwd"] = timed(lambda: head_fwd(params, skip), reps)

    @jax.jit
    def head_fwd_bwd(p, skip):
        return jax.grad(
            lambda s: head_fwd(p, s).astype(jnp.float32))(skip)

    rows["head_ce_fwd_bwd"] = timed(lambda: head_fwd_bwd(params, skip),
                                    reps)

    # ---- optimizer update alone
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    @jax.jit
    def opt_update(state):
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        return new_params

    try:
        rows["optimizer_update"] = timed(lambda: opt_update(state), reps)
    except Exception as e:  # state API may differ; non-fatal
        rows["optimizer_update"] = float("nan")
        print("optimizer timing failed:", e)

    print(f"\n{'component':36s} {'ms':>8s}")
    for k, v in rows.items():
        print(f"{k:36s} {v * 1e3:8.3f}")
    # derived
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
