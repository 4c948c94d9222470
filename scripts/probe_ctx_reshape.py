"""Probe: in-kernel (tile/10, 640) -> (tile, 64) row-major reshape.

The video encoder's last stage is a 10x stride-10 transposed conv,
computed as matmul (B, T/10, E) @ (E, 640) -> (B, T/10, 640) followed
by a row-major reshape to (B, T, 64).  On the XLA side that reshape is
a ~0.13 ms tiled-layout repack (each way) plus an encoder layout tail.
If Mosaic can do the reshape in-VMEM inside the trunk kernel, the
coarse (T/10, 640) activations can be streamed directly and the
repack + 10x of ctx HBM traffic disappears.

Measures: (a) does it lower, (b) reshape-in-kernel cost vs a plain
copy kernel at the same bytes.
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


def reshape_kernel(i_ref, o_ref):
    o_ref[0] = i_ref[0].reshape(TILE, 64)


def copy_kernel(i_ref, o_ref):
    o_ref[0] = i_ref[0]


def run(name, kern, ishape, oshape, iblock, oblock):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((N_TILES,) + ishape),
        DT)

    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((1,) + ishape, lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + oshape, lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TILES,) + oshape, DT),
    )(x).astype(jnp.float32).sum())
    try:
        out = f(x)
        out.block_until_ready()
    except Exception as e:
        print(f"{name}: FAILS — {type(e).__name__}: {str(e)[:300]}")
        return None
    t0 = time.perf_counter()
    for _ in range(100):
        out = f(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 100
    print(f"{name}: {dt * 1e6:.1f} us")
    return out


def main():
    r = run("reshape (400,640)->(4000,64)", reshape_kernel,
            (TILE // 10, 640), (TILE, 64),
            None, None)
    c = run("copy (4000,64)", copy_kernel, (TILE, 64), (TILE, 64),
            None, None)
    if r is not None:
        # correctness vs XLA reshape
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (N_TILES, TILE // 10, 640)), DT)
        want = jnp.sum(x.reshape(N_TILES, TILE, 64)
                       .astype(jnp.float32))
        got = jax.jit(lambda x: pl.pallas_call(
            reshape_kernel,
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec((1, TILE // 10, 640),
                                   lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TILE, 64), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES, TILE, 64), DT),
        )(x).astype(jnp.float32).sum())(x)
        print("correct:", bool(jnp.allclose(want, got)), float(want),
              float(got))


if __name__ == "__main__":
    main()
