"""Composite train-step experiments: where do the last ms hide?

 a) save vs recompute VJP strategy (recompute skips the 1.1 GB
    hsave/tfsg round-trip at the cost of re-running the layer matmuls:
    if the composite is HBM-bound the probe-invisible kernel wins
    would be explained, and recompute should pull ahead)
 b) loss fwd+bwd alone vs the full step (optimizer + metrics cost)
 c) the step with the optimizer but without metric extras

Run: python scripts/exp_composite.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from movenet_tpu.models.fused import fused_train_loss
    from movenet_tpu.train import make_train_step

    model, cfg, state, batch = bench._breakdancing_setup()
    params = state.params
    codes, video = batch.codes, batch.video
    reps = 32

    def timed(name, fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        d = (time.perf_counter() - t0) / reps
        print(f"{name:34s} {d * 1e3:8.3f} ms", flush=True)
        return d

    # (b) loss fwd+bwd alone (sum-reduced grads)
    grad_fn = jax.jit(lambda p: jax.tree_util.tree_map(
        jnp.sum,
        jax.grad(lambda q: fused_train_loss(
            model, q, codes, video, None, True)[0])(p))["front_cur"])
    timed("loss_fwd_bwd (save)", grad_fn, params)

    # (c) grads + optimizer update, no metrics
    tx = state.tx

    @jax.jit
    def step_nometrics(state, batch):
        grads = jax.grad(lambda q: fused_train_loss(
            model, q, batch.codes, batch.video, None, True)[0])(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_state=opt_state,
                             step=state.step + 1)

    s = state

    def run_nometrics():
        nonlocal s
        s = step_nometrics(s, batch)
        return s.step

    out = run_nometrics()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_nometrics()
    np.asarray(out)
    print(f"{'step_no_metrics (save)':34s} "
          f"{(time.perf_counter() - t0) / reps * 1e3:8.3f} ms",
          flush=True)

    # (a) recompute strategy end to end
    model_r = dataclasses.replace(model, remat=True)
    step_r = jax.jit(make_train_step(model_r, cfg))
    s2 = state

    def run_r():
        nonlocal s2
        s2, m = step_r(s2, batch)
        return m["loss"]

    out = run_r()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_r()
    np.asarray(out)
    print(f"{'full_train_step (recompute)':34s} "
          f"{(time.perf_counter() - t0) / reps * 1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
