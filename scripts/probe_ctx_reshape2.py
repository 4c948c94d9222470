"""Probe round 2: which in-kernel forms of the 10x-upsample interleave
does Mosaic accept, and at what cost?

The direct (400, 640) -> (4000, 64) reshape crashes the compiler
(probe_ctx_reshape.py).  Variants tried here:

  v1: (400, 640) block -> .reshape(400,10,64) -> .reshape(4000,64)
  v2: 3D (400, 10, 64) block -> .reshape(4000, 64)   [leading-dim merge]
  v3: inverse (4000, 64) -> (400, 10, 64)            [for the backward]
  v4: (2000, 128) -> (4000, 64)                      [factor-2 split]
  v5: per-phase slices + pltpu.repeat + select        [VPU interleave]

Each is timed against a plain copy kernel at the same output bytes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4000
N_TILES = 40
DT = jnp.bfloat16


def run(name, kern, ishape, oshape, check=None):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((N_TILES,) + ishape),
        DT)

    def call(x):
        return pl.pallas_call(
            kern,
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec(
                (1,) + ishape, lambda j: (j,) + (0,) * len(ishape),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1,) + oshape, lambda j: (j,) + (0,) * len(oshape),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES,) + oshape, DT),
        )(x)

    f = jax.jit(lambda x: call(x).astype(jnp.float32).sum())
    try:
        out = f(x)
        out.block_until_ready()
    except Exception as e:
        print(f"{name}: FAILS — {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    for _ in range(100):
        out = f(x)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / 100
    ok = ""
    if check is not None:
        got = np.asarray(jax.jit(call)(x))
        want = check(np.asarray(x, np.float32)).astype(np.float32)
        ok = "  exact" if np.array_equal(
            got.astype(np.float32), want.astype(DT).astype(np.float32)) \
            else "  WRONG"
    print(f"{name}: {dt * 1e6:.1f} us{ok}")


def v1_kernel(i_ref, o_ref):
    o_ref[0] = i_ref[0].reshape(TILE // 10, 10, 64).reshape(TILE, 64)


def v2_kernel(i_ref, o_ref):
    o_ref[0] = i_ref[0].reshape(TILE, 64)


def v3_kernel(i_ref, o_ref):
    o_ref[0] = i_ref[0].reshape(TILE // 10, 10, 64)


def v4_kernel(i_ref, o_ref):
    o_ref[0] = i_ref[0].reshape(TILE, 64)


def v5_kernel(i_ref, o_ref):
    blk = i_ref[0]                      # (400, 640)
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE, 64), 0)
    phase = jax.lax.rem(row, 10)
    out = jnp.zeros((TILE, 64), DT)
    for p in range(10):
        rep = pltpu.repeat(blk[:, 64 * p: 64 * (p + 1)], 10, 0)
        out = jnp.where(phase == p, rep, out)
    o_ref[0] = out


def main():
    def want_split(x):  # (N, 400, 640) -> (N, 4000, 64)
        return x.reshape(N_TILES, TILE, 64)

    run("v1 (400,640)->(400,10,64)->(4000,64)", v1_kernel,
        (TILE // 10, 640), (TILE, 64), want_split)
    run("v2 (400,10,64)3D->(4000,64)", v2_kernel,
        (TILE // 10, 10, 64), (TILE, 64),
        lambda x: x.reshape(N_TILES, TILE, 64))
    run("v3 (4000,64)->(400,10,64)", v3_kernel,
        (TILE, 64), (TILE // 10, 10, 64),
        lambda x: x.reshape(N_TILES, TILE // 10, 10, 64))
    run("v4 (2000,128)->(4000,64)", v4_kernel,
        (TILE // 2, 128), (TILE, 64),
        lambda x: x.reshape(N_TILES, TILE, 64))
    run("v5 slices+repeat+select", v5_kernel,
        (TILE // 10, 640), (TILE, 64), want_split)
    run("copy (4000,64)", lambda i, o: o.__setitem__(0, i[0]),
        (TILE, 64), (TILE, 64))


if __name__ == "__main__":
    main()
