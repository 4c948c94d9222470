"""f32- vs bf16-operand MXU rates at the trunk BACKWARD's four matmul
shapes (breakdancing config: tile=4000, R=S=64, W_in=192).

The bwd currently pins _BWD_OPERAND_DT = f32 ("casts cost more than
the MXU saves") — but that A/B built hp in f32 first (bf16 refs ->
astype(f32) -> concat -> astype(bf16) inside _mdot: two full converts).
This probe measures (a) the pure matmul rate per dtype (operands
pre-cast, back-to-back dots serialize on the MXU so no dependency
chain is needed for a throughput number) and (b) the standalone cost
of one (4000, 128) f32->bf16 convert, so the restructured
no-double-cast variant can be sized before building it.

Run: python scripts/probe_bwd_dtype.py
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


def make_mm_kernel(n_iters, mode):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:, :]
        b = b_ref[:, :]
        acc = None
        for _ in range(n_iters):
            if mode == "nn":      # (M,K)@(K,N)
                y = jnp.dot(a, b, preferred_element_type=jnp.float32)
            else:                 # t0: (K,M)^T@(K,N)
                y = jax.lax.dot_general(
                    a, b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        o_ref[0, 0] = jnp.sum(acc)

    return kernel


def make_cast_kernel(n_iters):
    def kernel(a_ref, o_ref):
        acc = None
        for i in range(n_iters):
            y = (a_ref[:, :] + jnp.float32(i)).astype(jnp.bfloat16)
            s = jnp.sum(y.astype(jnp.float32)[:1, :1])
            acc = s if acc is None else acc + s
        o_ref[0, 0] = acc

    return kernel


def timeit(f, *args, reps=20):
    g = jax.jit(f)
    np.asarray(g(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = g(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def bench_mm(ashape, bshape, mode, dtype, n_iters=200):
    a = jnp.asarray(np.random.default_rng(0).standard_normal(ashape),
                    dtype)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(bshape),
                    dtype)
    f = pl.pallas_call(
        make_mm_kernel(n_iters, mode),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    return timeit(lambda x, y: f(x, y), a, b) / n_iters


def main():
    print("devices:", jax.devices(), flush=True)
    cases = [
        ("dgated (4000,128)@(128,64)", (4000, 128), (128, 64), "nn"),
        ("wf t0  (4000,200)x(4000,128)", (4000, 200), (4000, 128), "t0"),
        ("wo t0  (4000,72)x(4000,128)", (4000, 72), (4000, 128), "t0"),
        ("dfg_w  (4000,128)@(128,192)", (4000, 128), (128, 192), "nn"),
    ]
    tot = {"f32": 0.0, "bf16": 0.0}
    for label, ash, bsh, mode in cases:
        for key, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            t = bench_mm(ash, bsh, mode, dt)
            tot[key] += t
            print(f"{label:30s} {key:5s} {t*1e6:8.2f} us", flush=True)
    for k, v in tot.items():
        print(f"sum[{k}] = {v*1e6:.2f} us per layer-tile "
              f"(x9 layers x80 grid = {v*9*80*1e3:.2f} ms)")

    n_iters = 200
    a = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4000, 128)), jnp.float32)
    f = pl.pallas_call(
        make_cast_kernel(n_iters),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    t = timeit(lambda x: f(x), a) / n_iters
    print(f"cast (4000,128) f32->bf16 (+add): {t*1e6:.2f} us "
          f"(x2 casts x9 x80 = {t*2*9*80*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
