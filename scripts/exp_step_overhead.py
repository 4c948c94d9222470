"""Split the train step's non-loss overhead (flat path).

 t1: value_and_grad of the raveled loss, scalar outputs only
 t2: t1 + core optimizer update (flat), scalar outputs only
 t3: t2 + unravel to the new params tree (tree output, like the step)
 t4: the real make_train_step
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    import bench
    from movenet_tpu.models.fused import fused_train_loss
    from movenet_tpu.train import make_train_step

    model, cfg, state, batch = bench._breakdancing_setup()
    codes, video = batch.codes, batch.video
    reps = 32
    core = state.tx.core
    flat0, unravel = ravel_pytree(state.params)

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

    def loss_flat(fp):
        return fused_train_loss(model, unravel(fp), codes, video,
                                None, True)[0]

    vg = jax.value_and_grad(loss_flat)

    t1 = jax.jit(lambda fp: (lambda l, g: l + jnp.sum(g * g))(*vg(fp)))
    timed("t1 flat loss+grad (scalar)", t1, flat0)

    def t2_fn(fp, opt_state):
        l, g = vg(fp)
        updates, new_opt = core.update(g, opt_state, fp)
        return l + jnp.sum(updates * updates)

    t2 = jax.jit(t2_fn)
    timed("t2 + core update (scalar)", t2, flat0, state.opt_state)

    def t3_fn(fp, opt_state):
        l, g = vg(fp)
        updates, new_opt = core.update(g, opt_state, fp)
        tree = unravel(fp + updates)
        return tree

    t3 = jax.jit(t3_fn)
    timed("t3 + unravel (tree out)", t3, flat0, state.opt_state)

    step = jax.jit(make_train_step(model, cfg))
    s = state

    def run():
        nonlocal s
        s, m = step(s, batch)
        return m["loss"]

    out = run()
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    np.asarray(out)
    print(f"{'t4 real train step':34s} "
          f"{(time.perf_counter() - t0) / reps * 1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
