"""Time the REAL stack_kernel._bwd_pallas directly on synthetic
operands (breakdancing shapes), to anchor the exp_trunk_bwd replica."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

B, T, R, S, L = 2, 160_000, 64, 64, 9
DIL = (1, 2, 4) * 3


def main():
    import jax
    import jax.numpy as jnp

    from movenet_tpu.ops.pallas.stack_kernel import (
        _bwd_pallas, _fwd_pallas, _pad8, _split_ring_offsets,
        pick_stack_tile)

    tile = pick_stack_tile(T, DIL)
    n_tiles = T // tile
    _, small_total, _ = _split_ring_offsets(DIL, tile)
    small_pad = _pad8(small_total)

    rng = np.random.default_rng(0)
    hsave = jnp.asarray(rng.standard_normal((L, B, T, R)) * 0.1,
                        jnp.bfloat16)
    tfsg = jnp.asarray(np.tanh(rng.standard_normal((L, B, T, 2 * R))),
                       jnp.bfloat16)
    tails = jnp.asarray(
        rng.standard_normal((B, n_tiles, small_pad, R)) * 0.1,
        jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((B, T, R)) * 0.1, jnp.bfloat16)
    w_fg = jnp.asarray(rng.standard_normal((L, 3 * R, 2 * R)) * 0.05,
                       jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((L, R, R + S)) * 0.05,
                        jnp.float32)
    dskip = jnp.asarray(rng.standard_normal((B, T, S)) * 0.01,
                        jnp.bfloat16)

    f = jax.jit(lambda *a: _bwd_pallas(*a, dilations=DIL,
                                       interpret=False)[2])
    args = (hsave, tfsg, tails, ctx, w_fg, w_out, dskip)
    np.asarray(f(*args))
    reps = 32
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    print(f"real _bwd_pallas {(time.perf_counter() - t0) / reps * 1e3:8.3f} ms")

    # and the real forward for completeness
    x = jnp.asarray(rng.standard_normal((B, T, R)) * 0.1, jnp.bfloat16)
    b_fg = jnp.zeros((L * B, 2 * R), jnp.float32)
    b_out = jnp.zeros((L, R + S), jnp.float32)
    g = jax.jit(lambda *a: _fwd_pallas(*a, dilations=DIL,
                                       interpret=False)[0])
    fargs = (x, ctx, b_fg, w_fg, w_out, b_out)
    np.asarray(g(*fargs))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*fargs)
    np.asarray(out)
    print(f"real _fwd_pallas {(time.perf_counter() - t0) / reps * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
