"""Trunk backward decomposition probe (v5e, timing only).

Variants of the save-mode backward kernel (stack_kernel._bwd_kernel_padded)
with pieces removed, on random operands at the breakdancing shapes
(B=2, T=160k, R=S=64, L=9, tile=4000, ctx on), to locate the ~3.4 ms
of non-MXU time:

  full     faithful op structure (timing twin of the real kernel)
  novpu    matmuls + minimal glue only: no gating-derivative math, no
           concats (dfg := dgated repeated), no rolls/ring, no reduces
  nowgrad  full minus the two wgrad matmuls + bias reduces
  nochain  full minus dfg_w matmul + dh ring propagation
  mmonly   the 4 matmuls per layer, nothing else

Run: python scripts/exp_trunk_bwd.py [--reps 16] [--variants ...]
                                     [--tile 4000]

--tile N (round 4): sweep the time-tile size.  Doubling the tile
halves the number of wgrad matmul issues (the tiny-M (193, 2R)/(65,
R+S) outputs whose per-issue pipeline drain is suspected fixed cost)
and halves every per-tile fixed cost (accumulator RMW, ring writes,
tail loads) at the price of bigger streamed blocks.  If `full` gets
faster with tile, the "wgrad two-tiles-per-pass" lever (VERDICT round-3
weak #2a) is worth building into the production kernel; if it OOMs or
flatlines, it is not — measure BEFORE building.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

B, T, R, S, L = 2, 160_000, 64, 64, 9
TILE = 4000
DIL = [1, 2, 4] * 3
N_TILES = T // TILE
W_IN = 3 * R  # [h | shifted | ctx]


def make_kernel(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wgrads = variant not in ("nowgrad",)
    chain = variant not in ("nochain",)
    vpu = variant not in ("novpu", "mmonly")
    if variant == "mmonly":
        wgrads = True
        chain = False
    # op-golf variants (all on top of `full`):
    #   fold_bias: ones-column augmentation folds the dbout/dbfg row
    #              reduces into the wgrad matmuls (M 64->65, 192->193:
    #              same MXU chunk counts)
    #   oneroll:   store the ROLLED dfg_p in the anti-causal ring so the
    #              future-tap select needs ONE roll per layer, not two
    #   packeddfg: df/dg as dense (tile, 128) packed ops (roll + select)
    #              instead of six half-lane ops + concat
    #   golf:      all three
    #   carrystage: the PRODUCTION d-row carry (stack_kernel._ring_carry,
    #              round-4 Mosaic-concat workaround): stage
    #              [dfg_p[d:]; saved] through a (TILE, R) scratch with
    #              three partial stores + one full read — A/B against
    #              the roll/where formulations above
    fold_bias = variant in ("fold_bias", "golf")
    oneroll = variant in ("oneroll", "golf")
    packeddfg = variant in ("packeddfg", "golf")
    carrystage = variant == "carrystage"

    tail_offs, tot = [], 0
    for d in DIL:
        tail_offs.append(tot)
        tot += d
    small_pad = max(8, ((tot + 7) // 8) * 8)
    ring_offs = [i * TILE for i in range(L)]

    def kernel(hsave_ref, tfsg_ref, tails_ref, ctx_ref, w_fg_t_ref,
               w_out_t_ref, dskip_ref,
               dx_ref, dctx_ref, db_fg_ref, dw_fg_ref, dw_out_ref,
               db_out_ref,
               dfgp_ring, dwfg_acc, dwout_acc, dbout_acc, dbfg_acc,
               carry_ref):
        b_idx = pl.program_id(0)
        rj = pl.program_id(1)
        ti = N_TILES - 1 - rj
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)

        @pl.when(jnp.logical_and(b_idx == 0, rj == 0))
        def _():
            dwfg_acc[:, :, :] = jnp.zeros(dwfg_acc.shape, jnp.float32)
            dwout_acc[:, :, :] = jnp.zeros(dwout_acc.shape, jnp.float32)
            dbout_acc[:, :] = jnp.zeros(dbout_acc.shape, jnp.float32)
            dbfg_acc[:, :] = jnp.zeros(dbfg_acc.shape, jnp.float32)

        ctx = ctx_ref[0].astype(jnp.float32)
        dh = jnp.zeros((TILE, R), jnp.float32)
        dskip = dskip_ref[0].astype(jnp.float32)
        dctx_acc = jnp.zeros((TILE, R), jnp.float32)

        ones_col = jnp.ones((TILE, 1), jnp.float32)
        lane2r = jax.lax.broadcasted_iota(jnp.int32, (TILE, 2 * R), 1)
        for l in reversed(range(L)):
            d = DIL[l]
            h = hsave_ref[l, 0].astype(jnp.float32)
            v = tfsg_ref[l, 0].astype(jnp.float32)
            if vpu:
                shifted = jnp.concatenate(
                    [tails_ref[0, 0, pl.ds(tail_offs[l], d), :].astype(
                        jnp.float32), h[: TILE - d, :]], axis=0)
                hparts = [h, shifted, ctx]
                if fold_bias:
                    hparts.append(ones_col)
                hp = jnp.concatenate(hparts, axis=1)
                dout = jnp.concatenate([dh, dskip], axis=1)
            else:
                hp = jnp.concatenate([h, h, ctx], axis=1)
                dout = jnp.concatenate([dh, dskip], axis=1)

            dgated = jnp.dot(dout, w_out_t_ref[l],
                             preferred_element_type=jnp.float32)
            if not vpu:
                gated = v[:, :R]
                dfg = jnp.concatenate([dgated, dgated], axis=1)
            elif packeddfg:
                # dense packed: A = [sg(1-tf^2) | tf(sg - sg^2)]
                vv = v * v
                u = 1.0 - vv                      # [1-tf^2 | 1-sg^2]
                w2 = v - vv                       # [tf-tf^2 | sg-sg^2]
                rolled = pltpu.roll(v, R, 1)      # [sg | tf]
                mix = jnp.where(lane2r < R, u, w2)
                a = rolled * mix
                dgated2 = jnp.concatenate([dgated, dgated], axis=1)
                dfg = dgated2 * a
                gated = v[:, :R] * v[:, R:]
            else:
                tf = v[:, :R]
                sg = v[:, R:]
                gated = tf * sg
                df = (dgated * sg) * (1.0 - tf * tf)
                dg = (dgated * tf) * (sg - sg * sg)
                dfg = jnp.concatenate([df, dg], axis=1)

            if wgrads:
                if fold_bias and vpu:
                    wf = jax.lax.dot_general(
                        hp, dfg, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dwfg_acc[l] += wf[: 3 * R]
                    dbfg_acc[pl.ds(l, 1), :] += wf[3 * R: 3 * R + 1]
                    go = jnp.concatenate([gated, ones_col], axis=1)
                    wo = jax.lax.dot_general(
                        go, dout, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dwout_acc[l] += wo[:R]
                    dbout_acc[pl.ds(l, 1), :] += wo[R: R + 1]
                else:
                    dwfg_acc[l] += jax.lax.dot_general(
                        hp[:, : 3 * R], dfg, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dwout_acc[l] += jax.lax.dot_general(
                        gated, dout, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if vpu:
                        dbout_acc[pl.ds(l, 1), :] += jnp.sum(
                            dout, axis=0, keepdims=True)
                        dbfg_acc[pl.ds(l, 1), :] += jnp.sum(
                            dfg, axis=0, keepdims=True)

            if chain:
                dfg_w = jnp.dot(dfg, w_fg_t_ref[l],
                                preferred_element_type=jnp.float32)
                dh = dh + dfg_w[:, :R]
                dfg_p = dfg_w[:, R: 2 * R]
                if not vpu:
                    dh = dh + dfg_p
                elif carrystage:
                    saved = dfgp_ring[pl.ds(ring_offs[l], d), :]
                    carry_ref[pl.ds(0, TILE - d), :] = dfg_p[d:]
                    carry_ref[pl.ds(TILE - d, d), :] = saved
                    dfgp_ring[pl.ds(ring_offs[l], d), :] = dfg_p[:d]
                    dh = dh + carry_ref[:, :]
                elif oneroll:
                    rolled_p = pltpu.roll(dfg_p, TILE - d, 0)
                    saved = dfgp_ring[pl.ds(ring_offs[l], TILE), :]
                    future = jnp.where(row < TILE - d, rolled_p, saved)
                    dh = dh + future
                    dfgp_ring[pl.ds(ring_offs[l], TILE), :] = rolled_p
                else:
                    saved = dfgp_ring[pl.ds(ring_offs[l], TILE), :]
                    future = jnp.where(row < TILE - d,
                                       pltpu.roll(dfg_p, TILE - d, 0),
                                       pltpu.roll(saved, TILE - d, 0))
                    dh = dh + future
                    dfgp_ring[pl.ds(ring_offs[l], TILE), :] = dfg_p
                dctx_acc = dctx_acc + dfg_w[:, 2 * R:]

        dx_ref[0] = dh.astype(jnp.bfloat16)
        dctx_ref[0] = dctx_acc.astype(jnp.bfloat16)

        @pl.when(rj == N_TILES - 1)
        def _():
            for l in range(L):
                db_fg_ref[pl.ds(l * B + b_idx, 1), :] = \
                    dbfg_acc[pl.ds(l, 1), :]

        @pl.when(jnp.logical_and(b_idx == B - 1, rj == N_TILES - 1))
        def _():
            dw_fg_ref[:, :, :] = dwfg_acc[:, :, :]
            dw_out_ref[:, :, :] = dwout_acc[:, :, :]
            db_out_ref[:, :] = dbout_acc[:, :]

    return kernel, small_pad


def main():
    global TILE, N_TILES
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--variants", type=str,
                    default="full,fold_bias,oneroll,packeddfg,golf")
    ap.add_argument("--tile", type=int, default=TILE,
                    help="time-tile size (must divide T=160000); sweep "
                    "e.g. 2000/4000/8000 to price per-tile fixed costs")
    args = ap.parse_args()
    assert T % args.tile == 0, f"tile {args.tile} must divide {T}"
    TILE = args.tile
    N_TILES = T // TILE

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def w(*shape, dtype=np.float32, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    _, small_pad = make_kernel("full")
    hsave = jnp.asarray(
        rng.standard_normal((L, B, T, R)) * 0.1, jnp.bfloat16)
    tfsg = jnp.asarray(
        np.tanh(rng.standard_normal((L, B, T, 2 * R))), jnp.bfloat16)
    tails = jnp.asarray(
        rng.standard_normal((B, N_TILES, small_pad, R)) * 0.1,
        jnp.bfloat16)
    ctx = jnp.asarray(
        rng.standard_normal((B, T, R)) * 0.1, jnp.bfloat16)
    w_fg_t = w(L, 2 * R, W_IN)
    w_out_t = w(L, R + S, R)
    dskip = jnp.asarray(
        rng.standard_normal((B, T, S)) * 0.01, jnp.bfloat16)

    def rmap(b, j):
        return (b, N_TILES - 1 - j, 0)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((L, 1, TILE, R),
                     lambda b, j: (0, b, N_TILES - 1 - j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 1, TILE, 2 * R),
                     lambda b, j: (0, b, N_TILES - 1 - j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, small_pad, R),
                     lambda b, j: (b, N_TILES - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE, R), rmap, memory_space=pltpu.VMEM),
        vm, vm,
        pl.BlockSpec((1, TILE, S), rmap, memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, TILE, R), rmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE, R), rmap, memory_space=pltpu.VMEM),
        vm, vm, vm, vm,
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, T, R), jnp.bfloat16),
        jax.ShapeDtypeStruct((B, T, R), jnp.bfloat16),
        jax.ShapeDtypeStruct((L * B, 2 * R), jnp.float32),
        jax.ShapeDtypeStruct((L, W_IN, 2 * R), jnp.float32),
        jax.ShapeDtypeStruct((L, R, R + S), jnp.float32),
        jax.ShapeDtypeStruct((L, R + S), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((L * TILE, R), jnp.float32),
        pltpu.VMEM((L, W_IN, 2 * R), jnp.float32),
        pltpu.VMEM((L, R, R + S), jnp.float32),
        pltpu.VMEM((L, R + S), jnp.float32),
        pltpu.VMEM((L, 2 * R), jnp.float32),
        pltpu.VMEM((TILE, R), jnp.float32),   # carrystage scratch
    ]

    for name in args.variants.split(","):
        kern, _ = make_kernel(name)
        f = jax.jit(lambda *a, k=kern: pl.pallas_call(
            k, grid=(B, N_TILES),
            in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(*a)[2])
        arr = (hsave, tfsg, tails, ctx, w_fg_t, w_out_t, dskip)
        np.asarray(f(*arr))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = f(*arr)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:10s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
