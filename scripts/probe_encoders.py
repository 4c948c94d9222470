"""Split the 3.2 ms 'encoders' cost: video conv vs front-embed gathers
vs weight packing vs reduction overhead.  Run on the real chip."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from movenet_tpu.models.fused import _front_embed, _prepare_trunk, \
        _stack_weights
    from movenet_tpu.models.wavenet import WaveNet

    model, cfg, state, batch = bench._breakdancing_setup()
    params = state.params
    codes, video = batch.codes, batch.video
    t = codes.shape[1]
    reps = 32

    def timed(name, fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:40s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    # empty dispatch floor
    timed("noop (dispatch floor)", jax.jit(lambda p: 1.0 + p),
          jnp.float32(1.0))

    vid = jax.jit(lambda p: jnp.sum(
        model.apply({"params": p}, video,
                    method=WaveNet.encode_video).astype(jnp.float32)))
    timed("encode_video fwd + sum", vid, params)

    fe = jax.jit(lambda p: jnp.sum(_front_embed(
        p["front_cur"], p["front_past"], codes, jnp.bfloat16,
        p["front_cur"].shape[0]).astype(jnp.float32)))
    timed("front_embed (2 takes + pad) + sum", fe, params)

    # one-hot matmul formulation of the same embedding
    def fe_mm(p):
        oh = jax.nn.one_hot(codes, 64, dtype=jnp.bfloat16)
        cur = jnp.dot(oh, p["front_cur"].astype(jnp.bfloat16),
                      preferred_element_type=jnp.bfloat16)
        prev = jnp.dot(oh, p["front_past"].astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
        h = cur + jnp.pad(prev, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        return jnp.sum(h.astype(jnp.float32))

    timed("front_embed as onehot matmuls + sum", jax.jit(fe_mm), params)

    pack = jax.jit(lambda p: jnp.sum(_stack_weights(
        model, _prepare_trunk(model, p, codes, None, None)[2],
        t, tuple(model.dilations))[2]))
    timed("weight packing + sum", pack, params)

    big = jnp.zeros((2, t, 64), jnp.bfloat16)
    timed("sum of one (2,T,64) bf16 array",
          jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))), big)


if __name__ == "__main__":
    main()
