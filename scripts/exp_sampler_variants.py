"""Sampler critical-path decomposition (v5e probe, timing only).

Standalone replica of the fast-mode AR sampler loop
(ops/pallas/ar_sampler.py) with pieces toggleable, on random weights,
so each component's contribution to the per-step latency can be read
off:

  base     tanh+sigmoid gating (current fast kernel structure)
  fma      packed tanh gating: ONE transcendental/layer, gated via fma
           (weights pre-scaled; mathematically identical)
  nohead   fma minus head+argmax (constant next code) -> chain floor
  nopre    nohead minus the off-chain `pre` matmuls -> pure chain
  noring   fma minus ring reads/writes (wrong results; issue-cost probe)

Run: python scripts/exp_sampler_variants.py [--steps 8000] [--reps 8]
     [--variants base,fma,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

L = 30          # layers (flagship: layer=10, stack=3)
R = 64          # residual channels
S = 64          # skip channels
C = 256         # mu-law classes
LANES = 128

DIL = [2 ** (i % 10) for i in range(L)]
OFFS = np.concatenate([[0], np.cumsum(DIL)[:-1]]).tolist()
SUM_D = int(np.sum(DIL))
RF = SUM_D + 3  # unused except loop bounds


def make_kernel(n_steps, gate, with_head, with_argmax, with_pack,
                with_ring, with_pre, precision=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import functools
    dot = functools.partial(jnp.dot,
                            preferred_element_type=jnp.float32,
                            precision=precision)

    def kernel(fc0_ref, fp0_ref, w_p0_ref, w_fg_ref, b_fg_ref,
               w_prod_ref, w_out_ref, b_out_ref,
               front_cur_ref, front_past_ref,
               h1_w_ref, h1_b_ref, h2_w_ref, h2_b_ref,
               buf_init_ref,
               out_ref, buf_ref):
        buf_ref[:, :] = buf_init_ref[:, :]
        col_iota_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, C), 1).astype(jnp.float32)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def slot_of(l, t):
            return OFFS[l] + jax.lax.rem(t, DIL[l])

        def step(t, carry):
            prev_oh, cur_col_f, out_row = carry
            code_oh = (col_iota_f == cur_col_f).astype(jnp.float32)

            past0 = buf_ref[pl.ds(slot_of(0, t), 1), :]
            fg = dot(code_oh, fc0_ref[:, :]) \
                + (dot(prev_oh, fp0_ref[:, :])
                   + dot(past0, w_p0_ref[:, :])
                   + b_fg_ref[pl.ds(0, 1), :])
            h = dot(code_oh, front_cur_ref[:, :]) \
                + dot(prev_oh, front_past_ref[:, :])
            skip_sum = jnp.zeros((1, S), jnp.float32)

            for l in range(L):
                if gate == "2t":
                    gated = jnp.tanh(fg[:, :R]) \
                        * jax.nn.sigmoid(fg[:, R:])
                elif gate == "sig":
                    # u = [sigmoid(2f) | sigmoid(g)] (weights pre-scaled)
                    u = jax.nn.sigmoid(fg)
                    gated = (u[:, :R] * 2.0 - 1.0) * u[:, R:]
                else:  # fma: fg's g-half pre-scaled by 0.5 via weights;
                    # w_prod/w_out rows pre-scaled by 0.5:
                    # gated' = tanh(f)*tanh(g/2) + tanh(f)
                    v = jnp.tanh(fg)
                    gated = v[:, :R] * v[:, R:] + v[:, :R]
                if l + 1 < L:
                    fgp = dot(gated, w_prod_ref[l])
                    if with_pre:
                        past = buf_ref[pl.ds(slot_of(l + 1, t), 1), :]
                        hp = jnp.concatenate([h, past], axis=1)
                        pre = dot(hp, w_fg_ref[l + 1]) \
                            + b_fg_ref[pl.ds(l + 1, 1), :]
                    else:
                        pre = b_fg_ref[pl.ds(l + 1, 1), :]
                    out = dot(gated, w_out_ref[l]) \
                        + b_out_ref[pl.ds(l, 1), :]
                    if with_ring:
                        buf_ref[pl.ds(slot_of(l, t), 1), :] = h
                    skip_sum = skip_sum + out[:, R:]
                    h = out[:, :R] + h
                    fg = fgp + pre
                else:
                    out = dot(gated, w_out_ref[l]) \
                        + b_out_ref[pl.ds(l, 1), :]
                    if with_ring:
                        buf_ref[pl.ds(slot_of(l, t), 1), :] = h
                    skip_sum = skip_sum + out[:, R:]

            if with_head:
                y = dot(jax.nn.leaky_relu(skip_sum), h1_w_ref[:, :]) \
                    + h1_b_ref[pl.ds(0, 1), :]
                logits = dot(jax.nn.leaky_relu(y), h2_w_ref[:, :]) \
                    + h2_b_ref[pl.ds(0, 1), :]
            else:
                logits = jnp.concatenate(
                    [skip_sum, skip_sum, skip_sum, skip_sum], axis=1)

            if with_argmax:
                m = jnp.max(logits, axis=-1, keepdims=True)
                cand = jnp.where(logits == m, col_iota_f, float(C))
                nxt_col_f = jnp.min(cand, axis=-1, keepdims=True)
            else:
                nxt_col_f = jnp.minimum(
                    jnp.max(logits[:, :1], axis=-1, keepdims=True) * 0.0
                    + 7.0, 255.0)

            if with_pack:
                pos = jax.lax.rem(t, LANES)
                tiled = pltpu.repeat(
                    cur_col_f.astype(jnp.int32), LANES, axis=1)
                mask = (lane_iota >= pos) & (lane_iota < pos + 1)
                out_row = jnp.where(mask, tiled, out_row)

                @pl.when(pos == LANES - 1)
                def _():
                    out_ref[pl.ds(t // LANES, 1), :] = out_row
                out_row = jnp.where(pos == LANES - 1,
                                    jnp.zeros_like(out_row), out_row)
            else:
                @pl.when(t == n_steps - 1)
                def _():
                    out_ref[pl.ds(0, 1), :] = \
                        pltpu.repeat(cur_col_f.astype(jnp.int32),
                                     LANES, axis=1)

            return (code_oh, nxt_col_f, out_row)

        cur0 = jnp.max(buf_init_ref[pl.ds(0, 1), :], axis=-1,
                       keepdims=True) + 5.0               # (1,1) non-const
        carry = ((col_iota_f == cur0 - 2.0).astype(jnp.float32),
                 cur0,
                 jnp.zeros((1, LANES), jnp.int32))
        jax.lax.fori_loop(0, n_steps, step, carry)

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--variants", type=str,
                    default="base,fma,nohead,nopre,noring")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def w(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale,
                           jnp.float32)

    inputs = [
        w(C, 2 * R), w(C, 2 * R), w(R, 2 * R),            # fc0 fp0 w_p0
        w(L, 2 * R, 2 * R), w(L, 2 * R),                  # w_fg b_fg
        w(L, R, 2 * R), w(L, R, R + S), w(L, R + S),      # w_prod w_out b_out
        w(C, R), w(C, R),                                 # front tables
        w(S, C), w(1, C), w(C, C), w(1, C),               # head
        jnp.zeros((SUM_D, R), jnp.float32),               # buf_init
    ]

    n_steps = args.steps
    out_rows = -(-n_steps // LANES)

    cfgs = {
        "base": dict(gate="2t", with_head=True, with_argmax=True,
                     with_pack=True, with_ring=True, with_pre=True),
        "fma": dict(gate="fma", with_head=True, with_argmax=True,
                    with_pack=True, with_ring=True, with_pre=True),
        "noargmax": dict(gate="fma", with_head=True, with_argmax=False,
                         with_pack=True, with_ring=True, with_pre=True),
        "nohead": dict(gate="fma", with_head=False, with_argmax=False,
                       with_pack=True, with_ring=True, with_pre=True),
        "nopre": dict(gate="fma", with_head=False, with_argmax=False,
                      with_pack=True, with_ring=True, with_pre=False),
        "noring": dict(gate="fma", with_head=True, with_argmax=True,
                       with_pack=True, with_ring=False, with_pre=True),
        "nopack": dict(gate="fma", with_head=True, with_argmax=True,
                       with_pack=False, with_ring=True, with_pre=True),
        # base with HIGHEST-precision dots = the REAL kernel's _dot;
        # confirms how much of the real kernel's latency is the 6-pass
        # f32 MXU algorithm
        "hi": dict(gate="2t", with_head=True, with_argmax=True,
                   with_pack=True, with_ring=True, with_pre=True,
                   precision="highest"),
        # packed gating via sigmoid instead of tanh (sigmoid lowers
        # cheaper): u = sigmoid(fg'), gated = (2 u0 - 1) u1
        "fma_sig": dict(gate="sig", with_head=True, with_argmax=True,
                        with_pack=True, with_ring=True, with_pre=True),
    }

    for name in args.variants.split(","):
        cfg = cfgs[name]
        f = jax.jit(lambda *a, cfg=cfg: pl.pallas_call(
            make_kernel(n_steps, **cfg),
            out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((SUM_D, R), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*a))
        np.asarray(f(*inputs))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = f(*inputs)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:10s} {dt / n_steps * 1e6:8.3f} us/step "
              f"({n_steps / dt:,.0f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
