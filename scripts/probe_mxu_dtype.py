"""Measure the Pallas/Mosaic MXU rate for f32-operand vs bf16-operand
matmuls on the attached TPU chip.

Hypothesis (round 3): the fused trunk kernels upcast every operand to
f32 before `jnp.dot(..., preferred_element_type=f32)`, and Mosaic
lowers an f32xf32 matmul as a multi-pass bf16 decomposition — i.e. the
kernels run the MXU at a fraction of the bf16 rate the XLA path (which
computes in bf16) gets for the same model math.  If true, casting
operands to bf16 (accumulate f32) is worth ~2-3x on the trunk matmuls.

Run: python scripts/probe_mxu_dtype.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_iters: int, op_dtype):
    """Chain n_iters dependent (TILE, K)@(K, N) matmuls in VMEM."""

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:, :]
        w = w_ref[:, :]
        acc = jnp.zeros((x.shape[0], w.shape[1]), jnp.float32)
        for _ in range(n_iters):
            y = jnp.dot(x.astype(op_dtype), w.astype(op_dtype),
                        preferred_element_type=jnp.float32)
            # fold the result back so iterations stay dependent
            acc = acc + y
            x = jnp.concatenate(
                [y[:, : x.shape[1] // 2] * 1e-3,
                 x[:, x.shape[1] // 2:]], axis=1)
        o_ref[0, 0] = jnp.sum(acc)

    return kernel


def bench(tile, k, n, n_iters, op_dtype, store_dtype, reps=20):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((tile, k)),
                    store_dtype)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((k, n)),
                    store_dtype)
    f = pl.pallas_call(
        make_kernel(n_iters, op_dtype),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    g = jax.jit(lambda a, b: f(a, b))
    np.asarray(g(x, w))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = g(x, w)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * tile * k * n * n_iters
    return dt, flops / dt / 1e12


def main():
    print("devices:", jax.devices(), flush=True)
    shapes = [
        (4000, 192, 128, "trunk fg fwd shape"),
    ]
    for tile, k, n, label in shapes:
        for op_dtype, store in (
            (jnp.float32, jnp.float32),
            (jnp.bfloat16, jnp.float32),
            (jnp.bfloat16, jnp.bfloat16),
        ):
            dt, tflops = bench(tile, k, n, 200, op_dtype, store)
            print(f"{label:24s} ops={op_dtype.__name__:9s} "
                  f"store={store.__name__:9s} {dt*1e3:7.3f} ms "
                  f"{tflops:7.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
