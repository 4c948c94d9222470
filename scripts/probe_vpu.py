"""VPU/MXU op-cost probe at trunk-kernel shapes (v5e).

Times tiny Pallas kernels that repeat ONE op in a serial chain, so the
per-op cost (issue + execute, dependency-serialized like the real
trunk layer loop) can be read off directly.  Used to decide which
kernel rewrites pay: packed-tanh gating, concat elimination, etc.

Run: python scripts/probe_vpu.py [--iters 64] [--reps 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROWS = 4000


def main():
    ap = argparse.ArgumentParser()
    # iters must be large enough that kernel time dominates the ~1.25 ms
    # per-dispatch tunnel cost (sub-us ops need thousands of iters)
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    iters, reps = args.iters, args.reps

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def chain_kernel(op, cols):
        """x -> op applied `iters` times in a serial chain (fori_loop:
        a Python unroll at thousands of iters explodes compile time)."""
        def kernel(x_ref, o_ref):
            x = x_ref[:, :cols]
            x = jax.lax.fori_loop(0, iters, lambda i, x: op(x), x)
            o_ref[:, :cols] = x
        return kernel

    def run(name, op, cols, base_cols=128):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((ROWS, base_cols))
            * 0.1, jnp.float32)
        f = jax.jit(lambda x: pl.pallas_call(
            chain_kernel(op, cols),
            out_shape=jax.ShapeDtypeStruct((ROWS, base_cols),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        np.asarray(f(x))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        per_op_us = dt / iters * 1e6
        print(f"{name:44s} {per_op_us:9.3f} us/op")
        return per_op_us

    print(f"serial-chain op cost, {ROWS} rows, {iters} iters:")
    run("tanh (4000,128)", jnp.tanh, 128)
    run("tanh (4000,64)", jnp.tanh, 64)
    run("sigmoid (4000,128)", jax.nn.sigmoid, 128)
    run("sigmoid (4000,64)", jax.nn.sigmoid, 64)
    run("mul by const (4000,128)", lambda x: x * 1.0001, 128)
    run("mul by const (4000,64)", lambda x: x * 1.0001, 64)
    run("exp (4000,128)", jnp.exp, 128)

    # tanh+sigmoid pair on halves (current gating) vs packed tanh
    def pair(x):
        a = jnp.tanh(x[:, :64])
        b = jax.nn.sigmoid(x[:, 64:])
        return jnp.concatenate([a, b], axis=1)

    run("tanh(:,:64)+sigmoid(:,64:)+concat", pair, 128)

    def packed(x):
        v = jnp.tanh(x)
        return v * (v * 0.5 + 0.5)  # stand-in epilogue cost

    run("tanh(128)+fma epilogue (packed gating)", packed, 128)

    # concat cost: [a(:, :64) | roll] style copies
    def concat3(x):
        h = x[:, :64]
        return jnp.concatenate([h, h, h[:, :64]], axis=1)[:, :128] + x

    run("3-piece concat192 (+add)", concat3, 128)

    # matmul chain at trunk shapes
    w192 = jnp.asarray(
        np.random.default_rng(1).standard_normal((192, 128)) * 0.05,
        jnp.float32)
    w128 = jnp.asarray(
        np.random.default_rng(2).standard_normal((128, 128)) * 0.05,
        jnp.float32)
    w64 = jnp.asarray(
        np.random.default_rng(3).standard_normal((64, 128)) * 0.05,
        jnp.float32)

    def mm_chain(w, k):
        def kernel(x_ref, w_ref, o_ref):
            def body(i, x):
                y = jnp.dot(x[:, :k], w_ref[:, :],
                            preferred_element_type=jnp.float32)
                # keep the carry shape fixed at (ROWS, 192)
                return jnp.concatenate([y, y[:, :64]], axis=1)
            x = jax.lax.fori_loop(0, iters, body, x_ref[:, :])
            o_ref[:, :] = x[:, :128]
        return kernel

    def run_mm(name, w, k):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((ROWS, 192)) * 0.1,
            jnp.float32)
        f = jax.jit(lambda x: pl.pallas_call(
            mm_chain(w, k),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w))
        np.asarray(f(x))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:44s} {dt / iters * 1e6:9.3f} us/op")

    run_mm("matmul (4000,192)x(192,128)", w192, 192)
    run_mm("matmul (4000,128)x(128,128)", w128, 128)
    run_mm("matmul (4000,64)x(64,128)", w64, 64)


if __name__ == "__main__":
    main()
