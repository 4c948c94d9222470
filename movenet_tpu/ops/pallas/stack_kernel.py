"""Whole-stack fused WaveNet trunk (training path), Pallas TPU.

The per-block kernels (gated_block.py) still round-trip the residual
stream and the skip accumulator through HBM once per layer.  This
kernel runs ALL gated blocks for a time tile in one program:

  forward:  the residual stream and the skip accumulator live in
            registers across the unrolled layer loop; per-layer dilation
            ring buffers share one packed VMEM scratch (static offsets).
            HBM traffic per tile: read x + ctx once, write skip_sum once
            and the per-layer inputs h_l (saved for the backward pass).
  backward: reverse time tiles; per layer (top-down) the gating is
            recomputed from the saved h_l (the shifted slice comes from
            L additional views of the same saved array with per-layer
            shifted index maps), dh chains through the layers in
            registers, per-layer anti-causal rings carry the past-tap
            gradients, and all weight grads accumulate in stacked f32
            VMEM scratch.  dctx accumulates across layers in registers
            and is written once per tile.

One tile size serves the whole stack: it divides T and every dilation
is either < tile or a multiple of it (powers of two make this easy).
Numerics are identical to the per-block path (same fp32 MXU math); the
equivalence/grad tests pin it against the unfused XLA formulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from movenet_tpu.ops.pallas.gated_block import (
    _dot,
    _dot_t0,
    _mdot,
    _mdot_t0,
)
from movenet_tpu.ops.pallas.head_loss import (
    _core,
    _dleaky,
    _leaky,
    _match_rows,
    _nll_rows,
)


def pick_stack_tile(t: int, dilations, ctx: bool = False) -> int:
    # MOVENET_STACK_TILE overrides the preference order head.  The
    # order is measured, not guessed: round-5 full-train-step sweep on
    # the breakdancing config (v5e, 64 chained steps, fused save mode)
    # gave 11.38 ms at tile 4000, 10.51 at 2000, 9.96 at 1600 (the
    # minimum), 10.63 at 800 — smaller tiles double-buffer the ~46 MB
    # hsave/tfsg backward streams that a 4000 tile cannot overlap,
    # until per-tile fixed costs (ring writes, wgrad issues) win back
    # below ~1600.  The forward alone prefers LARGER tiles (3.43 ms at
    # 4000 vs 3.51 at 1600): the order is an end-to-end call.
    #
    # ctx=True: prefer tiles usable by the in-kernel stride-10 ctx
    # projection backward, whose dctx/xc blocks are (tile/10, C) rows
    # (wavenet.py UPSAMPLE_STRIDE): tile/10 must be integral AND %8
    # (Mosaic's second-to-last-dim rule; tile=1000 -> 100 rows failed
    # lowering on-chip 2026-08-19), i.e. tile % 80 == 0.  Soft: if no
    # %80 tile divides T, fall back to the unconstrained pick —
    # models/fused._ctx_proj_tile_ok re-checks %80 on the result and
    # keeps the projection OUT of the kernel (full-rate ctx) then, so
    # every kernel entry of one fwd/bwd pair still agrees on the tile.
    prefer = (1600, 2000, 4000, 1000, 800, 512, 500, 400, 256, 200,
              128, 64, 32, 16, 8)
    want = int(os.environ.get("MOVENET_STACK_TILE", "0"))
    if want:
        prefer = (want,) + prefer
    passes = (True, False) if ctx else (False,)
    for need80 in passes:
        for tile in prefer:
            if t % tile or tile % 8:
                continue
            if need80 and tile % 80:
                continue
            if all(d < tile or d % tile == 0 for d in dilations):
                return tile
    raise ValueError(f"no stack tile for T={t}, dilations={dilations}")


def _ring_offsets(dilations):
    offs, total = [], 0
    for d in dilations:
        offs.append(total)
        total += d
    return offs, total


def _pad8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


def _gate(fg, r: int):
    """(tf, sg) PixelCNN gating halves of the fg tile, in f32.

    Two half-lane transcendentals.  Measured A/B on v5e: packing the
    gating into ONE dense (tile, 2R) transcendental via pre-scaled
    weights (tanh form: [tanh f | tanh(g/2)]; sigmoid form:
    [sigmoid(2f) | sigmoid(g)]) is SLOWER than this unpacked pair
    (+2.0 ms/step and +0.7 ms/step respectively on the breakdancing
    config) — Mosaic's half-lane transcendentals don't pay the full
    dense-lane cost, and tanh in particular is far more expensive than
    sigmoid per lane.  Also measured: computing the tanh on bf16
    vectors (to halve its lane width) LOSES +0.37 ms/step on the
    breakdancing config — Mosaic's bf16 tanh lowering is slower than
    dense f32, and its logistic lowering rejects bf16 outright — so
    the gate always runs in f32 and is rounded only where stored.
    """
    return jnp.tanh(fg[:, :r]), jax.nn.sigmoid(fg[:, r:])


def _dfg_from_v(v, dgated, r: int):
    """(gated, d[f|g]) from the saved packed gating tile v = [tf | sg].

    Dense-lane formulation (measured -0.7 ms/step vs six half-lane ops
    on v5e, scripts/exp_trunk_bwd.py 'packeddfg'): with
    rolled = [sg | tf] and mix = [1 - tf^2 | sg - sg^2],
      dfg = [dgated | dgated] * rolled * mix
          = [dgated * sg * (1 - tf^2) | dgated * tf * sg * (1 - sg)].
    """
    vv = v * v
    u = 1.0 - vv                       # [1 - tf^2 | 1 - sg^2]
    w2 = v - vv                        # [tf - tf^2 | sg - sg^2]
    rolled = pltpu.roll(v, r, 1)       # [sg | tf]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    mix = jnp.where(lane < r, u, w2)
    dgated2 = jnp.concatenate([dgated, dgated], axis=1)
    dfg = dgated2 * (rolled * mix)
    gated = v[:, :r] * v[:, r:]
    return gated, dfg


def _ring_carry(dh, dfg_p, dfgp_ring, carry_ref, off, d: int,
                tile: int):
    """d-row anti-causal carry, staged through a VMEM scratch tile.

    Bit-identical to ``dh + concat([dfg_p[d:], saved], axis=0)`` —
    but that concat does NOT lower through Mosaic when ``dfg_p`` is a
    lane-slice of a wider matmul result ("result/input offset mismatch
    on non-concat dimension", v5e libtpu 2026-08: the slice carries a
    lane offset the ring read doesn't).  Routing both pieces through
    ``carry_ref`` lets the stores relayout each side for free.

    Requires 0 < d < tile: d == tile would make the first store
    zero-length (undefined at lowering).  All call sites guarantee it —
    the head/padded path branches to the whole-window ring for
    d >= tile, and tails mode requires every d < tile
    (supports_recompute) — but assert so a new caller can't miss it.
    """
    assert 0 < d < tile, (d, tile)  # trace-time, free
    saved = dfgp_ring[pl.ds(off, d), :]
    carry_ref[pl.ds(0, tile - d), :] = dfg_p[d:]
    carry_ref[pl.ds(tile - d, d), :] = saved
    dfgp_ring[pl.ds(off, d), :] = dfg_p[:d]
    return dh + carry_ref[:, :]


def _split_ring_offsets(dilations, tile: int):
    """Ring offsets with the d<tile layers packed FIRST, so the prefix
    of the ring is exactly the per-tile boundary state ("tails") the
    backward needs for those layers; returns (offs, small_total,
    total)."""
    order = [l for l, d in enumerate(dilations) if d < tile] + \
            [l for l, d in enumerate(dilations) if d >= tile]
    offs, tot = [0] * len(dilations), 0
    for l in order:
        offs[l] = tot
        tot += dilations[l]
    small_total = sum(d for d in dilations if d < tile)
    return offs, small_total, tot


def supports_recompute(t: int, dilations) -> bool:
    """The tails-recompute VJP needs every dilation inside one tile."""
    try:
        tile = pick_stack_tile(t, dilations)
    except ValueError:
        return False
    return all(d < tile for d in dilations)



# Backward-kernel matmul operand dtype override: jnp.float32 keeps the
# bwd operands in f32; None = the storage dtype (single-pass MXU on
# bf16 models).  bf16 measured SLOWER twice on v5e: once with doubled
# casts (f32 hp rebuilt then re-cast inside _mdot) and once with the
# restructured single-cast operands (12.63 vs 12.01 ms/step,
# probe_bwd_dtype.py round 3) — Mosaic's f32 dot at these shapes beats
# bf16-plus-casts, so f32 stays.  The do_layer/tails restructure is
# operand-dtype-generic and identical to the old code at f32.
_BWD_OPERAND_DT = jnp.float32
# split the fg wgrad into per-operand-block matmuls (skips the
# (tile, W_in+1) hp concat, a full-tile VPU copy per layer, for one
# extra MXU M-chunk).  BUILT AND DISPROVEN on v5e (breakdancing
# config): 11.79 vs 11.36 ms/step — the extra M-chunk at f32 operands
# (multi-pass MXU) costs more than the concat's VPU copy saves.  Row
# blocks of a wgrad are contraction-independent, so both forms are
# bit-identical; kept behind the flag for narrower-channel configs.
_BWD_SPLIT_WGRAD = False

# hsave above this budget flips the auto strategy to tails-recompute
_SAVE_ALL_BUDGET_BYTES = 1 << 30

# >0 enables layer-chunked streaming in the save-mode backward (bytes
# of hsave+tfsg per grid step); measured slower on v5e — see
# _bwd_pallas
_BWD_LAYER_CHUNK_BUDGET = 0


def resolve_strategy(strategy: str, x_shape, n_layers: int,
                     dilations, itemsize: int = 2) -> str:
    """Pick the VJP strategy.

    "save" keeps every layer input in HBM for the backward (measured
    faster on v5e for the canonical configs: the extra DMA hides under
    the MXU-bound layer matmuls, while recompute adds MXU work to the
    critical path).  "recompute" saves only per-tile ring snapshots —
    O(sum(dilations)) rows instead of (L, B, T, R) — for long-sequence /
    deep configs where hsave would blow the HBM budget (the kernel-level
    analogue of ModelConfig.remat).  "replay" saves the taps (tfsg) but
    not hsave: the backward replays the residual stream bit-exactly
    from the rounded taps — halves the saved-activation HBM footprint
    for one extra (R, R) matmul per layer (measured +0.6 ms/step on the
    v5e breakdancing config, where that DMA was hidden under MXU work —
    use when HBM capacity, not speed, is the constraint).  "auto"
    chooses by hsave size.
    """
    if strategy not in ("auto", "save", "recompute", "replay"):
        raise ValueError(f"unknown fused_stack strategy: {strategy!r}")
    b, t, r = x_shape
    can_recompute = supports_recompute(t, dilations)
    if strategy in ("recompute", "replay"):
        if not can_recompute:
            raise ValueError(
                f"{strategy} strategy needs every dilation inside one "
                f"tile (T={t}, dilations={tuple(dilations)})")
        return strategy
    if strategy == "save":
        return "save"
    hsave_bytes = n_layers * b * t * r * itemsize
    if can_recompute and hsave_bytes > _SAVE_ALL_BUDGET_BYTES:
        return "recompute"
    return "save"


# --------------------------------------------------------------- forward
def _embed_onehot(pack_ref, b_idx, tile: int, vocab: int,
                  n_batch: int):
    """Packed causal-embedding one-hot: (tile, 2V) with the current
    code's one-hot in columns [0, V) and the previous code's in
    [V, 2V), so ONE K=2V matmul against the stacked [cur; past] table
    computes h[t] = cur[codes[t]] + past[codes[t-1]].  Out-of-range
    codes (-1 marks t=0, which has no past tap) contribute zeros.

    pack_ref is the (tile, >=2B) packed code block: column b holds
    codes[b], column n_batch + b holds codes[b] shifted one step right
    (one host-side s32 relayout serves every consumer; see
    models/fused.py)."""
    lane_b = jax.lax.broadcasted_iota(jnp.int32, pack_ref.shape, 1)
    # the pack may arrive int16 (half the HBM relayout traffic); widen
    # once at load, all comparisons below stay s32
    pack = pack_ref[:, :].astype(jnp.int32)
    cur_col = jnp.sum(jnp.where(lane_b == b_idx, pack, 0), axis=1,
                      keepdims=True)                     # (tile, 1)
    prev_col = jnp.sum(jnp.where(lane_b == n_batch + b_idx, pack, 0),
                       axis=1, keepdims=True)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (tile, 2 * vocab), 1)
    tgt2 = jnp.where(lane_c < vocab, cur_col, prev_col + vocab)
    return (lane_c == tgt2).astype(jnp.float32)


def _fwd_kernel(dilations, r: int, s: int, has_ctx: bool, tile: int,
                out_dtype, n_batch: int, embed_vocab: int = 0,
                save_h: bool = True):
    n_layers = len(dilations)
    offs, small_total, _ = _split_ring_offsets(dilations, tile)
    small_pad = _pad8(small_total)

    def kernel(x_ref, ctx_ref, b_fg_ref, w_fg_ref, w_out_ref, b_out_ref,
               *rest):
        if embed_vocab:
            table2_ref, *rest = rest
        if save_h:
            (skip_ref, hsave_ref, tfsg_ref, tails_ref, ring_ref) = rest
        else:
            (skip_ref, tfsg_ref, tails_ref, ring_ref) = rest
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)
        t0 = ti * tile

        @pl.when(ti == 0)
        def _():
            ring_ref[:, :] = jnp.zeros(ring_ref.shape, jnp.float32)

        # snapshot the d<tile boundary rows for the backward (those
        # layers then need no full previous-tile reload)
        tails_ref[0, 0] = ring_ref[pl.ds(0, small_pad), :].astype(
            out_dtype)

        if embed_vocab:
            oh2 = _embed_onehot(x_ref, b_idx, tile, embed_vocab,
                                n_batch)
            h = _mdot(oh2, table2_ref[:, :], out_dtype)
            if out_dtype != jnp.float32:
                # round like the XLA path so hsave (what the backward
                # sees) matches the h the forward actually used
                h = h.astype(out_dtype).astype(jnp.float32)
        else:
            h = x_ref[0].astype(jnp.float32)
        ctx = ctx_ref[0].astype(jnp.float32) if has_ctx else None
        skip_acc = jnp.zeros((tile, s), jnp.float32)

        for l, d in enumerate(dilations):
            if save_h:
                hsave_ref[l, 0] = h.astype(out_dtype)
            if d >= tile:
                slot = offs[l] + jax.lax.rem(t0, d)
                shifted = ring_ref[pl.ds(slot, tile), :]
                ring_ref[pl.ds(slot, tile), :] = h
            else:
                shifted = jnp.concatenate(
                    [ring_ref[pl.ds(offs[l], d), :], h[: tile - d, :]],
                    axis=0)
                ring_ref[pl.ds(offs[l], d), :] = h[tile - d:, :]
            parts = [h, shifted] + ([ctx] if has_ctx else [])
            hp = jnp.concatenate(parts, axis=1)
            # operands in the compute dtype (see _mdot): the rounded hp
            # the MXU sees equals what hsave stores, so the backward's
            # rebuilt hp matches the forward's operand exactly
            fg = _mdot(hp, w_fg_ref[l], out_dtype) \
                + b_fg_ref[pl.ds(l * n_batch + b_idx, 1), :]
            tf, sg = _gate(fg, r)
            # packed [tf | sg]: 2R = 128 lanes exactly, so this write is
            # padding-free; the backward reads it instead of re-running
            # the K=192 fg matmul (the largest FLOP class in the VJP)
            v = jnp.concatenate([tf, sg], axis=1).astype(out_dtype)
            tfsg_ref[l, 0] = v
            # gated comes from the ROUNDED taps (identity in f32): the
            # backward derives gated from the saved tfsg, and without
            # per-layer hsave it also rebuilds the h chain from it —
            # rounding first makes both reconstructions bit-exact (and
            # matches the XLA path, which gates in the compute dtype)
            vf = v.astype(jnp.float32)
            gated = vf[:, :r] * vf[:, r:]
            out = _mdot(gated, w_out_ref[l], out_dtype) \
                + b_out_ref[pl.ds(l, 1), :]
            skip_acc = skip_acc + out[:, r:]
            h = out[:, :r] + h

        skip_ref[0] = skip_acc.astype(out_dtype)

    return kernel


def _fwd_pallas(x, ctx, b_fg, w_fg, w_out, b_out, dilations,
                interpret: bool, embed=None, dtype=None,
                save_h: bool = True):
    """embed=(codes_tb, codes_prev_tb, table2) replaces x: the front
    causal-conv embedding is computed IN the kernel (one-hot matmul per
    tile), so neither h nor any one-hot matrix touches HBM."""
    if embed is None:
        batch, t_total, r = x.shape
        dtype = x.dtype
    else:
        codes2_tb, table2, batch = embed
        t_total = codes2_tb.shape[0]
        r = table2.shape[1]
        vocab = table2.shape[0] // 2
    s = w_out.shape[2] - r
    has_ctx = ctx is not None
    n_layers = len(dilations)
    tile = pick_stack_tile(t_total, dilations, ctx=has_ctx)
    n_tiles = t_total // tile
    _, small_total, ring_rows = _split_ring_offsets(dilations, tile)
    small_pad = _pad8(small_total)

    def tmap(b, i):
        return (b, i, 0)

    if has_ctx:
        ctx_spec = pl.BlockSpec((1, tile, r), tmap,
                                memory_space=pltpu.VMEM)
        ctx_arg = ctx
    else:
        ctx_spec = pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                memory_space=pltpu.SMEM)
        ctx_arg = jnp.zeros((1, 1), jnp.int32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    if embed is None:
        lead_args = (x,)
        lead_specs = [pl.BlockSpec((1, tile, r), tmap,
                                   memory_space=pltpu.VMEM)]
        mid_args, mid_specs = (), []
    else:
        code_spec = pl.BlockSpec((tile, codes2_tb.shape[1]),
                                 lambda b, i: (i, 0),
                                 memory_space=pltpu.VMEM)
        lead_args = (codes2_tb,)
        lead_specs = [code_spec]
        mid_args = (table2,)
        mid_specs = [vm]

    # save_h=False ("replay" strategy): the backward rebuilds the h
    # chain per tile from tfsg (bit-exact: fwd gates from the rounded
    # taps) — hsave and its ~1.2 GB/step of HBM never exist
    save_h = save_h or any(d >= tile for d in dilations)
    hsave_specs, hsave_shapes = [], []
    if save_h:
        hsave_specs = [pl.BlockSpec((n_layers, 1, tile, r),
                                    lambda b, i: (0, b, i, 0),
                                    memory_space=pltpu.VMEM)]
        hsave_shapes = [jax.ShapeDtypeStruct(
            (n_layers, batch, t_total, r), dtype)]

    outs = pl.pallas_call(
        _fwd_kernel(tuple(dilations), r, s, has_ctx, tile, dtype,
                    batch, embed_vocab=0 if embed is None else vocab,
                    save_h=save_h),
        grid=(batch, n_tiles),
        in_specs=lead_specs + [ctx_spec, vm, vm, vm, vm] + mid_specs,
        out_specs=(
            pl.BlockSpec((1, tile, s), tmap, memory_space=pltpu.VMEM),
            *hsave_specs,
            pl.BlockSpec((n_layers, 1, tile, 2 * r),
                         lambda b, i: (0, b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, small_pad, r),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, s), dtype),
            *hsave_shapes,
            jax.ShapeDtypeStruct((n_layers, batch, t_total, 2 * r),
                                 dtype),
            jax.ShapeDtypeStruct((batch, n_tiles, small_pad, r),
                                 dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((max(ring_rows, small_pad, 8), r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*lead_args, ctx_arg, b_fg, w_fg, w_out, b_out, *mid_args)
    if save_h:
        skip, hsave, tfsg, tails = outs
    else:
        skip, tfsg, tails = outs
        hsave = None
    return skip, hsave, tfsg, tails


# ------------------------------------- forward (save mode, fused head)
def _fwd_kernel_head(dilations, r: int, s: int, has_ctx: bool,
                     tile: int, out_dtype, n_batch: int, n_tiles: int,
                     rf: int, t_total: int, c: int, parity: bool):
    n_layers = len(dilations)
    offs, small_total, _ = _split_ring_offsets(dilations, tile)
    small_pad = _pad8(small_total)

    def kernel(x_ref, ctx_ref, b_fg_ref, w_fg_ref, w_out_ref, b_out_ref,
               tgt_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               skip_ref, hsave_ref, tfsg_ref, tails_ref,
               loss_ref, match_ref, ring_ref, acc_ref):
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)
        t0 = ti * tile

        @pl.when(jnp.logical_and(b_idx == 0, ti == 0))
        def _():
            acc_ref[0, 0] = 0.0
            acc_ref[0, 1] = 0.0

        @pl.when(ti == 0)
        def _():
            ring_ref[:, :] = jnp.zeros(ring_ref.shape, jnp.float32)

        tails_ref[0, 0] = ring_ref[pl.ds(0, small_pad), :].astype(
            out_dtype)

        h = x_ref[0].astype(jnp.float32)
        ctx = ctx_ref[0].astype(jnp.float32) if has_ctx else None
        skip_acc = jnp.zeros((tile, s), jnp.float32)

        for l, d in enumerate(dilations):
            hsave_ref[l, 0] = h.astype(out_dtype)
            if d >= tile:
                slot = offs[l] + jax.lax.rem(t0, d)
                shifted = ring_ref[pl.ds(slot, tile), :]
                ring_ref[pl.ds(slot, tile), :] = h
            else:
                shifted = jnp.concatenate(
                    [ring_ref[pl.ds(offs[l], d), :], h[: tile - d, :]],
                    axis=0)
                ring_ref[pl.ds(offs[l], d), :] = h[tile - d:, :]
            parts = [h, shifted] + ([ctx] if has_ctx else [])
            hp = jnp.concatenate(parts, axis=1)
            fg = _mdot(hp, w_fg_ref[l], out_dtype) \
                + b_fg_ref[pl.ds(l * n_batch + b_idx, 1), :]
            tf, sg = _gate(fg, r)
            tfsg_ref[l, 0] = jnp.concatenate([tf, sg],
                                             axis=1).astype(out_dtype)
            gated = tf * sg
            out = _mdot(gated, w_out_ref[l], out_dtype) \
                + b_out_ref[pl.ds(l, 1), :]
            skip_acc = skip_acc + out[:, r:]
            h = out[:, :r] + h

        # head + CE straight off the tile's skip accumulator; round to
        # the storage dtype first so the backward's recompute from the
        # saved skip is bit-consistent
        skipb = skip_acc.astype(out_dtype)
        skip_ref[0] = skipb
        sk = skipb.astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, tgt_ref.shape, 1)
        tgt_col = jnp.sum(jnp.where(lane == b_idx,
                                    tgt_ref[:, :].astype(jnp.int32), 0),
                          axis=1, keepdims=True)
        _, z, p, onehot, zmax = _core(
            sk, tgt_col, w1_ref[:, :], b1_ref[pl.ds(0, 1), :],
            w2_ref[:, :], b2_ref[pl.ds(0, 1), :], c, parity,
            out_dtype)
        nll = _nll_rows(z, p, onehot, parity, zmax)
        match = _match_rows(z, tgt_col, zmax)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t0
        valid = ((row >= rf - 1) & (row < t_total - 1)).astype(
            jnp.float32)
        acc_ref[0, 0] += jnp.sum(nll * valid)
        acc_ref[0, 1] += jnp.sum(match * valid)

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 ti == n_tiles - 1))
        def _():
            loss_ref[0, 0] = acc_ref[0, 0]
            match_ref[0, 0] = acc_ref[0, 1]

    return kernel


def _fwd_pallas_head(x, ctx, b_fg, w_fg, w_out, b_out, targets_tb,
                     w1, b1, w2, b2, dilations, rf: int, parity: bool,
                     interpret: bool):
    batch, t_total, r = x.shape
    s = w_out.shape[2] - r
    c = w2.shape[1]
    has_ctx = ctx is not None
    n_layers = len(dilations)
    tile = pick_stack_tile(t_total, dilations, ctx=has_ctx)
    n_tiles = t_total // tile
    _, small_total, ring_rows = _split_ring_offsets(dilations, tile)
    small_pad = _pad8(small_total)

    def tmap(b, i):
        return (b, i, 0)

    if has_ctx:
        ctx_spec = pl.BlockSpec((1, tile, r), tmap,
                                memory_space=pltpu.VMEM)
        ctx_arg = ctx
    else:
        ctx_spec = pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                memory_space=pltpu.SMEM)
        ctx_arg = jnp.zeros((1, 1), jnp.int32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _fwd_kernel_head(tuple(dilations), r, s, has_ctx, tile, x.dtype,
                         batch, n_tiles, rf, t_total, c, parity),
        grid=(batch, n_tiles),
        in_specs=[pl.BlockSpec((1, tile, r), tmap,
                               memory_space=pltpu.VMEM),
                  ctx_spec, vm, vm, vm, vm,
                  pl.BlockSpec((tile, batch), lambda b, i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vm, vm, vm, vm],
        out_specs=(
            pl.BlockSpec((1, tile, s), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, 1, tile, r),
                         lambda b, i: (0, b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, 1, tile, 2 * r),
                         lambda b, i: (0, b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, small_pad, r),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, s), x.dtype),
            jax.ShapeDtypeStruct((n_layers, batch, t_total, r), x.dtype),
            jax.ShapeDtypeStruct((n_layers, batch, t_total, 2 * r),
                                 x.dtype),
            jax.ShapeDtypeStruct((batch, n_tiles, small_pad, r),
                                 x.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((max(ring_rows, small_pad, 8), r), jnp.float32),
            pltpu.SMEM((1, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ctx_arg, b_fg, w_fg, w_out, b_out, targets_tb,
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    skip, hsave, tfsg, tails, loss, match = outs
    return loss[0, 0], match[0, 0], skip, hsave, tfsg, tails


# ------------------------------------ backward (save mode, fused head)
def _bwd_kernel_head(dilations, r, s, has_ctx, tile, n_tiles, n_batch,
                     in_dtype, ring_offs, rf, t_total, c, parity):
    mdt = _BWD_OPERAND_DT or in_dtype
    n_layers = len(dilations)
    tail_offs, _, _ = _split_ring_offsets(dilations, tile)
    big_layers = [l for l, d in enumerate(dilations) if d >= tile]
    shift_slot = {l: i for i, l in enumerate(big_layers)}

    def kernel(*refs):
        (hsave_ref, tfsg_ref, tails_ref, ctx_ref, w_fg_t_ref,
         w_out_t_ref, skip_ref, tgt_ref,
         w1_ref, b1_ref, w2_ref, b2_ref, w1t_ref, w2t_ref,
         dloss_ref, *rest) = refs
        shift_refs = rest[:len(big_layers)]
        (dx_ref, dctx_ref, db_fg_ref, dw_fg_ref, dw_out_ref,
         db_out_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
         dfgp_ring, dwfg_acc, dwout_acc, dbout_acc, dbfg_acc,
         dw1_acc, db1_acc, dw2_acc, db2_acc,
         carry_ref) = rest[len(big_layers):]

        b_idx = pl.program_id(0)
        rj = pl.program_id(1)
        ti = n_tiles - 1 - rj
        t0 = ti * tile
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)

        @pl.when(jnp.logical_and(b_idx == 0, rj == 0))
        def _():
            dwfg_acc[:, :, :] = jnp.zeros(dwfg_acc.shape, jnp.float32)
            dwout_acc[:, :, :] = jnp.zeros(dwout_acc.shape, jnp.float32)
            dbout_acc[:, :] = jnp.zeros(dbout_acc.shape, jnp.float32)
            dw1_acc[:, :] = jnp.zeros(dw1_acc.shape, jnp.float32)
            db1_acc[:, :] = jnp.zeros(db1_acc.shape, jnp.float32)
            dw2_acc[:, :] = jnp.zeros(dw2_acc.shape, jnp.float32)
            db2_acc[:, :] = jnp.zeros(db2_acc.shape, jnp.float32)

        @pl.when(rj == 0)
        def _():
            dfgp_ring[:, :] = jnp.zeros(dfgp_ring.shape, jnp.float32)
            dbfg_acc[:, :] = jnp.zeros(dbfg_acc.shape, jnp.float32)

        ctx = ctx_ref[0].astype(jnp.float32) if has_ctx else None

        # ---- head backward: recompute z from the saved skip and form
        # dskip for this tile (exactly head_loss._bwd_kernel, fused)
        skip = skip_ref[0].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, tgt_ref.shape, 1)
        tgt_col = jnp.sum(jnp.where(lane == b_idx,
                                    tgt_ref[:, :].astype(jnp.int32), 0),
                          axis=1, keepdims=True)
        y, z, p, onehot, _zmax = _core(
            skip, tgt_col, w1_ref[:, :], b1_ref[pl.ds(0, 1), :],
            w2_ref[:, :], b2_ref[pl.ds(0, 1), :], c, parity,
            in_dtype)
        rowt = row + t0
        valid = ((rowt >= rf - 1) & (rowt < t_total - 1)).astype(
            jnp.float32)
        scale = dloss_ref[0] * valid
        if parity:
            ep = jnp.exp(p)              # p in [0,1]: no stabilizer
            q = ep / jnp.sum(ep, axis=-1, keepdims=True)
            g = q - onehot
            dz = p * g - p * jnp.sum(p * g, axis=-1, keepdims=True)
        else:
            dz = jax.nn.softmax(z, axis=-1) - onehot
        dz = dz * scale
        ly = _leaky(y)
        dw2_acc[:, :] += _mdot_t0(ly, dz, mdt)
        db2_acc[:, :] += jnp.sum(dz, axis=0, keepdims=True)
        dy = _mdot(dz, w2t_ref[:, :], mdt) * _dleaky(y)
        lskip = _leaky(skip)
        dw1_acc[:, :] += _mdot_t0(lskip, dy, mdt)
        db1_acc[:, :] += jnp.sum(dy, axis=0, keepdims=True)
        dskip = _mdot(dy, w1t_ref[:, :], mdt) * _dleaky(skip)

        # ---- layer backward (identical to _bwd_kernel_padded)
        dh = jnp.zeros((tile, r), jnp.float32)
        dctx_acc = jnp.zeros((tile, r), jnp.float32) if has_ctx else None
        ones_col = jnp.ones((tile, 1), jnp.float32)
        w_in = (3 if has_ctx else 2) * r

        for l in reversed(range(n_layers)):
            d = dilations[l]
            off = ring_offs[l]
            h = hsave_ref[l, 0].astype(jnp.float32)
            if d >= tile:
                shifted = shift_refs[shift_slot[l]][0, 0].astype(
                    jnp.float32)
                shifted = jnp.where(t0 < d, jnp.zeros_like(shifted),
                                    shifted)
            else:
                shifted = jnp.concatenate(
                    [tails_ref[0, 0, pl.ds(tail_offs[l], d), :].astype(
                        jnp.float32), h[: tile - d, :]], axis=0)
            parts = [h, shifted] + ([ctx] if has_ctx else []) \
                + [ones_col]
            hp = jnp.concatenate(parts, axis=1)
            v = tfsg_ref[l, 0].astype(jnp.float32)

            dout = jnp.concatenate([dh, dskip], axis=1)
            dgated = _mdot(dout, w_out_t_ref[l], mdt)
            gated, dfg = _dfg_from_v(v, dgated, r)

            wf = _mdot_t0(hp, dfg, mdt)
            dwfg_acc[l] += wf[:w_in]
            dbfg_acc[pl.ds(l, 1), :] += wf[w_in: w_in + 1]
            go = jnp.concatenate([gated, ones_col], axis=1)
            wo = _mdot_t0(go, dout, mdt)
            dwout_acc[l] += wo[:r]
            dbout_acc[pl.ds(l, 1), :] += wo[r: r + 1]

            dfg_w = _mdot(dfg, w_fg_t_ref[l], mdt)
            dh = dh + dfg_w[:, :r]
            dfg_p = dfg_w[:, r: 2 * r]
            if d >= tile:
                slot = off + jax.lax.rem(t0, d)
                dh = dh + dfgp_ring[pl.ds(slot, tile), :]
                dfgp_ring[pl.ds(slot, tile), :] = dfg_p
            else:
                # d-row anti-causal carry (see _bwd_pallas)
                dh = _ring_carry(dh, dfg_p, dfgp_ring, carry_ref,
                                 off, d, tile)
            if has_ctx:
                dctx_acc = dctx_acc + dfg_w[:, 2 * r:]

        dx_ref[0] = dh.astype(in_dtype)
        if has_ctx:
            dctx_ref[0] = dctx_acc.astype(in_dtype)
        else:
            dctx_ref[0] = jnp.zeros((tile, r), in_dtype)

        @pl.when(rj == n_tiles - 1)
        def _():
            for l in range(n_layers):
                db_fg_ref[pl.ds(l * n_batch + b_idx, 1), :] = \
                    dbfg_acc[pl.ds(l, 1), :]

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 rj == n_tiles - 1))
        def _():
            dw_fg_ref[:, :, :] = dwfg_acc[:, :, :]
            dw_out_ref[:, :, :] = dwout_acc[:, :, :]
            db_out_ref[:, :] = dbout_acc[:, :]
            dw1_ref[:, :] = dw1_acc[:, :]
            db1_ref[:, :] = db1_acc[:, :]
            dw2_ref[:, :] = dw2_acc[:, :]
            db2_ref[:, :] = db2_acc[:, :]

    return kernel


def _bwd_pallas_head(hsave, tfsg, tails, ctx, w_fg, w_out, skip,
                     targets_tb, w1, b1, w2, b2, dloss,
                     dilations, rf, parity, interpret: bool):
    n_layers, batch, t_total, r = hsave.shape
    s = w_out.shape[2] - r
    c = w2.shape[1]
    has_ctx = ctx is not None
    tile = pick_stack_tile(t_total, dilations, ctx=has_ctx)
    n_tiles = t_total // tile
    w_in = w_fg.shape[1]
    small_pad = tails.shape[2]
    # d-row anti-causal carry slots (see _bwd_pallas)
    offs2, total2 = _ring_offsets(dilations)

    def rmap(b, j):
        return (b, n_tiles - 1 - j, 0)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    if has_ctx:
        ctx_spec = pl.BlockSpec((1, tile, r), rmap,
                                memory_space=pltpu.VMEM)
        ctx_arg = ctx
    else:
        ctx_spec = pl.BlockSpec((1, 1), lambda b, j: (0, 0),
                                memory_space=pltpu.SMEM)
        ctx_arg = jnp.zeros((1, 1), jnp.int32)

    hsave_spec = pl.BlockSpec((n_layers, 1, tile, r),
                              lambda b, j: (0, b, n_tiles - 1 - j, 0),
                              memory_space=pltpu.VMEM)
    tfsg_spec = pl.BlockSpec((n_layers, 1, tile, 2 * r),
                             lambda b, j: (0, b, n_tiles - 1 - j, 0),
                             memory_space=pltpu.VMEM)
    tails_spec = pl.BlockSpec((1, 1, small_pad, r),
                              lambda b, j: (b, n_tiles - 1 - j, 0, 0),
                              memory_space=pltpu.VMEM)
    big_layers = [l for l, d in enumerate(dilations) if d >= tile]
    shift_specs = [
        pl.BlockSpec((1, 1, tile, r),
                     lambda b, j, l=l, d=dilations[l]: (
                         l, b,
                         jnp.maximum((n_tiles - 1 - j) - d // tile, 0),
                         0),
                     memory_space=pltpu.VMEM)
        for l in big_layers
    ]

    outs = pl.pallas_call(
        _bwd_kernel_head(tuple(dilations), r, s, has_ctx, tile,
                         n_tiles, batch, hsave.dtype, tuple(offs2),
                         rf, t_total, c, parity),
        grid=(batch, n_tiles),
        in_specs=[hsave_spec, tfsg_spec, tails_spec, ctx_spec, vm, vm,
                  pl.BlockSpec((1, tile, s), rmap,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, batch),
                               lambda b, j: (n_tiles - 1 - j, 0),
                               memory_space=pltpu.VMEM),
                  vm, vm, vm, vm, vm, vm,
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  *shift_specs],
        out_specs=(
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            vm, vm, vm, vm, vm, vm, vm, vm,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, r), hsave.dtype),
            jax.ShapeDtypeStruct((batch, t_total, r), hsave.dtype),
            jax.ShapeDtypeStruct((n_layers * batch, 2 * r), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, w_in, 2 * r), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, r, r + s), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, r + s), jnp.float32),
            jax.ShapeDtypeStruct((s, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((max(8, total2), r), jnp.float32),
            pltpu.VMEM((n_layers, w_in, 2 * r), jnp.float32),
            pltpu.VMEM((n_layers, r, r + s), jnp.float32),
            pltpu.VMEM((n_layers, r + s), jnp.float32),
            pltpu.VMEM((n_layers, 2 * r), jnp.float32),
            pltpu.VMEM((s, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((tile, r), jnp.float32),   # _ring_carry stage
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(hsave, tfsg, tails, ctx_arg,
      jnp.swapaxes(w_fg, 1, 2), jnp.swapaxes(w_out, 1, 2),
      skip, targets_tb, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      jnp.swapaxes(w1, 0, 1), jnp.swapaxes(w2, 0, 1),
      jnp.asarray([dloss], jnp.float32),
      *([hsave] * len(big_layers)))
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def fused_stack_head_loss(x, ctx, b_fg, w_fg, w_out, b_out,
                          targets_tb, w1, b1, w2, b2,
                          dilations: tuple, rf: int, parity: bool,
                          interpret: bool = False):
    """Whole trunk + output head + CE in one kernel per direction
    (save strategy): returns (loss_sum, match_count) over the valid
    region [RF-1, T-1) — the logits, per-position losses, and dskip
    never materialize in HBM, and the head's matmuls ride the same
    grid as the layer stack.

    Equivalent to fused_stack followed by fused_head_loss (the loss is
    computed from the same rounded skip accumulator both ways); the
    combined VJP recomputes the head from the saved skip per tile and
    feeds dskip straight into the layer gradient sweep.
    """
    loss, match, *_ = _fwd_pallas_head(
        x, ctx, b_fg, w_fg, w_out, b_out, targets_tb, w1, b1, w2, b2,
        dilations, rf, parity, interpret)
    return loss, match


def _fshl_fwd(x, ctx, b_fg, w_fg, w_out, b_out, targets_tb,
              w1, b1, w2, b2, dilations, rf, parity, interpret):
    loss, match, skip, hsave, tfsg, tails = _fwd_pallas_head(
        x, ctx, b_fg, w_fg, w_out, b_out, targets_tb, w1, b1, w2, b2,
        dilations, rf, parity, interpret)
    return (loss, match), (hsave, tfsg, tails, ctx, w_fg, w_out, skip,
                           targets_tb, w1, b1, w2, b2)


def _fshl_bwd(dilations, rf, parity, interpret, saved, grads):
    (hsave, tfsg, tails, ctx, w_fg, w_out, skip, targets_tb,
     w1, b1, w2, b2) = saved
    dloss, _ = grads  # the match count is not differentiated
    (dx, dctx, db_fg, dw_fg, dw_out, db_out,
     dw1, db1, dw2, db2) = _bwd_pallas_head(
        hsave, tfsg, tails, ctx, w_fg, w_out, skip, targets_tb,
        w1, b1, w2, b2, dloss, dilations, rf, parity, interpret)
    if ctx is None:
        dctx = None
    return (dx, dctx, db_fg.astype(jnp.float32),
            dw_fg.astype(w_fg.dtype), dw_out.astype(w_out.dtype),
            db_out.astype(jnp.float32), None,
            dw1.astype(w1.dtype), db1.reshape(-1).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(-1).astype(b2.dtype))


fused_stack_head_loss.defvjp(_fshl_fwd, _fshl_bwd)


# ----------------------------------------------- forward (tails mode)
def _fwd_kernel_tails(dilations, r: int, s: int, has_ctx: bool,
                      tile: int, out_dtype, n_batch: int):
    """Forward that saves only per-tile ring snapshots for the backward.

    The residual stream is rounded to the storage dtype after every
    layer so the backward's recompute (same ops from the same rounded
    inputs) reproduces each layer input bit-for-bit.
    """
    n_layers = len(dilations)
    offs, _ = _ring_offsets(dilations)

    def kernel(x_ref, ctx_ref, b_fg_ref, w_fg_ref, w_out_ref, b_out_ref,
               skip_ref, tails_ref, ring_ref):
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _():
            ring_ref[:, :] = jnp.zeros(ring_ref.shape, jnp.float32)

        # snapshot the tap state (h_l[t0-d_l : t0] per layer) for the
        # backward recompute; every ring value is exactly representable
        # in out_dtype (x is out_dtype and h is rounded per layer)
        tails_ref[0, 0] = ring_ref[:, :].astype(out_dtype)

        h = x_ref[0].astype(jnp.float32)
        ctx = ctx_ref[0].astype(jnp.float32) if has_ctx else None
        skip_acc = jnp.zeros((tile, s), jnp.float32)

        for l, d in enumerate(dilations):
            shifted = jnp.concatenate(
                [ring_ref[pl.ds(offs[l], d), :], h[: tile - d, :]],
                axis=0)
            ring_ref[pl.ds(offs[l], d), :] = h[tile - d:, :]
            parts = [h, shifted] + ([ctx] if has_ctx else [])
            hp = jnp.concatenate(parts, axis=1)
            fg = _mdot(hp, w_fg_ref[l], out_dtype) \
                + b_fg_ref[pl.ds(l * n_batch + b_idx, 1), :]
            tf, sg = _gate(fg, r)
            gated = tf * sg
            out = _mdot(gated, w_out_ref[l], out_dtype) \
                + b_out_ref[pl.ds(l, 1), :]
            skip_acc = skip_acc + out[:, r:]
            h = out[:, :r] + h
            if out_dtype != jnp.float32:
                h = h.astype(out_dtype).astype(jnp.float32)

        skip_ref[0] = skip_acc.astype(out_dtype)

    return kernel


def _fwd_pallas_tails(x, ctx, b_fg, w_fg, w_out, b_out, dilations,
                      interpret: bool):
    batch, t_total, r = x.shape
    s = w_out.shape[2] - r
    has_ctx = ctx is not None
    tile = pick_stack_tile(t_total, dilations, ctx=has_ctx)
    n_tiles = t_total // tile
    ring_pad = _pad8(_ring_offsets(dilations)[1])

    def tmap(b, i):
        return (b, i, 0)

    if has_ctx:
        ctx_spec = pl.BlockSpec((1, tile, r), tmap,
                                memory_space=pltpu.VMEM)
        ctx_arg = ctx
    else:
        ctx_spec = pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                memory_space=pltpu.SMEM)
        ctx_arg = jnp.zeros((1, 1), jnp.int32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    skip, tails = pl.pallas_call(
        _fwd_kernel_tails(tuple(dilations), r, s, has_ctx, tile,
                          x.dtype, batch),
        grid=(batch, n_tiles),
        in_specs=[pl.BlockSpec((1, tile, r), tmap,
                               memory_space=pltpu.VMEM),
                  ctx_spec, vm, vm, vm, vm],
        out_specs=(
            pl.BlockSpec((1, tile, s), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ring_pad, r),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, s), x.dtype),
            jax.ShapeDtypeStruct((batch, n_tiles, ring_pad, r), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((ring_pad, r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ctx_arg, b_fg, w_fg, w_out, b_out)
    return skip, tails


# ---------------------------------------------- backward (tails mode)
def _bwd_kernel_tails(dilations, r: int, s: int, has_ctx: bool,
                      tile: int, n_tiles: int, n_batch: int, in_dtype):
    mdt = _BWD_OPERAND_DT or in_dtype
    n_layers = len(dilations)
    offs, _ = _ring_offsets(dilations)

    def kernel(x_ref, tails_ref, ctx_ref, b_fg_ref, w_fg_ref, w_fg_t_ref,
               w_out_ref, w_out_t_ref, b_out_ref, dskip_ref,
               dx_ref, dctx_ref, db_fg_ref, dw_fg_ref, dw_out_ref,
               db_out_ref,
               hstack, dfgp_ring, dwfg_acc, dwout_acc, dbout_acc,
               dbfg_acc, carry_ref):
        b_idx = pl.program_id(0)
        rj = pl.program_id(1)
        ti = n_tiles - 1 - rj
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)

        @pl.when(jnp.logical_and(b_idx == 0, rj == 0))
        def _():
            dwfg_acc[:, :, :] = jnp.zeros(dwfg_acc.shape, jnp.float32)
            dwout_acc[:, :, :] = jnp.zeros(dwout_acc.shape, jnp.float32)
            dbout_acc[:, :] = jnp.zeros(dbout_acc.shape, jnp.float32)

        @pl.when(rj == 0)
        def _():
            dfgp_ring[:, :] = jnp.zeros(dfgp_ring.shape, jnp.float32)
            dbfg_acc[:, :] = jnp.zeros(dbfg_acc.shape, jnp.float32)

        ctx = ctx_ref[0].astype(jnp.float32) if has_ctx else None

        # ---- phase 1: rebuild every layer input for this tile from x
        # and the forward's ring snapshot (bit-identical: same ops on
        # the same rounded values)
        h = x_ref[0].astype(jnp.float32)
        for l, d in enumerate(dilations):
            hstack[l] = h
            if l == n_layers - 1:
                break  # the top layer's OUTPUT is never needed
            shifted = jnp.concatenate(
                [tails_ref[0, 0, pl.ds(offs[l], d), :].astype(
                    jnp.float32), h[: tile - d, :]], axis=0)
            parts = [h, shifted] + ([ctx] if has_ctx else [])
            hp = jnp.concatenate(parts, axis=1)
            # forward-reproducing matmuls use the FORWARD's operand
            # dtype (in_dtype == the fwd's out_dtype), not the
            # gradient-matmul override, so the rebuilt h is
            # bit-identical to _fwd_kernel_tails'
            fg = _mdot(hp, w_fg_ref[l], in_dtype) \
                + b_fg_ref[pl.ds(l * n_batch + b_idx, 1), :]
            tf, sg = _gate(fg, r)
            gated = tf * sg
            # only the residual half of the output projection is needed
            res = _mdot(gated, w_out_ref[l][:, :r], in_dtype) \
                + b_out_ref[pl.ds(l, 1), :][:, :r]
            h = res + h
            if in_dtype != jnp.float32:
                h = h.astype(in_dtype).astype(jnp.float32)

        # ---- phase 2: top-down gradient sweep (same as save-all mode,
        # with shifted taps rebuilt from hstack + tails)
        dh = jnp.zeros((tile, r), jnp.float32)
        dskip = dskip_ref[0].astype(jnp.float32)
        dctx_acc = jnp.zeros((tile, r), jnp.float32) if has_ctx else None

        for l in reversed(range(n_layers)):
            d = dilations[l]
            h = hstack[l]
            shifted = jnp.concatenate(
                [tails_ref[0, 0, pl.ds(offs[l], d), :].astype(
                    jnp.float32), h[: tile - d, :]], axis=0)
            parts = [h, shifted] + ([ctx] if has_ctx else [])
            hp = jnp.concatenate(parts, axis=1)
            # ONE hp cast serves both the fg recompute (forward operand
            # dtype — exact: h/tails/ctx values are already rounded)
            # and the wgrad matmul when mdt == in_dtype
            hp_f = hp.astype(in_dtype)
            # fg recompute mirrors the forward (operand dtype included)
            fg = jnp.dot(hp_f, w_fg_ref[l].astype(in_dtype),
                         preferred_element_type=jnp.float32) \
                + b_fg_ref[pl.ds(l * n_batch + b_idx, 1), :]
            v = jnp.concatenate(_gate(fg, r), axis=1)

            dout = jnp.concatenate([dh, dskip], axis=1)
            dout_m = dout.astype(mdt)
            dgated = jnp.dot(dout_m, w_out_t_ref[l].astype(mdt),
                             preferred_element_type=jnp.float32)
            gated, dfg = _dfg_from_v(v, dgated, r)
            dfg_m = dfg.astype(mdt)

            hp_m = hp_f if mdt == in_dtype else hp.astype(mdt)
            dwfg_acc[l] += jax.lax.dot_general(
                hp_m, dfg_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwout_acc[l] += jax.lax.dot_general(
                gated.astype(mdt), dout_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbout_acc[pl.ds(l, 1), :] += jnp.sum(dout, axis=0,
                                                 keepdims=True)
            dbfg_acc[pl.ds(l, 1), :] += jnp.sum(dfg, axis=0,
                                                keepdims=True)

            dfg_w = jnp.dot(dfg_m, w_fg_t_ref[l].astype(mdt),
                            preferred_element_type=jnp.float32)
            dh = dh + dfg_w[:, :r]
            dfg_p = dfg_w[:, r: 2 * r]
            # d-row anti-causal carry (see _bwd_pallas)
            dh = _ring_carry(dh, dfg_p, dfgp_ring, carry_ref,
                             offs[l], d, tile)
            if has_ctx:
                dctx_acc = dctx_acc + dfg_w[:, 2 * r:]

        dx_ref[0] = dh.astype(in_dtype)
        if has_ctx:
            dctx_ref[0] = dctx_acc.astype(in_dtype)
        else:
            dctx_ref[0] = jnp.zeros((tile, r), in_dtype)

        @pl.when(rj == n_tiles - 1)
        def _():
            for l in range(n_layers):
                db_fg_ref[pl.ds(l * n_batch + b_idx, 1), :] = \
                    dbfg_acc[pl.ds(l, 1), :]

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 rj == n_tiles - 1))
        def _():
            dw_fg_ref[:, :, :] = dwfg_acc[:, :, :]
            dw_out_ref[:, :, :] = dwout_acc[:, :, :]
            db_out_ref[:, :] = dbout_acc[:, :]

    return kernel


def _bwd_pallas_tails(x, tails, ctx, b_fg, w_fg, w_out, b_out, dskip,
                      dilations, interpret: bool):
    batch, t_total, r = x.shape
    s = w_out.shape[2] - r
    has_ctx = ctx is not None
    tile = pick_stack_tile(t_total, dilations, ctx=has_ctx)
    n_tiles = t_total // tile
    w_in = w_fg.shape[1]
    n_layers = len(dilations)
    # the in-kernel forward recompute uses the same pre-scaled fg
    # weights as the forward pass; w_fg_t (for dfg_w) stays original

    def rmap(b, j):
        return (b, n_tiles - 1 - j, 0)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    if has_ctx:
        ctx_spec = pl.BlockSpec((1, tile, r), rmap,
                                memory_space=pltpu.VMEM)
        ctx_arg = ctx
    else:
        ctx_spec = pl.BlockSpec((1, 1), lambda b, j: (0, 0),
                                memory_space=pltpu.SMEM)
        ctx_arg = jnp.zeros((1, 1), jnp.int32)
    ring_pad = tails.shape[2]

    outs = pl.pallas_call(
        _bwd_kernel_tails(tuple(dilations), r, s, has_ctx, tile,
                          n_tiles, batch, x.dtype),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ring_pad, r),
                         lambda b, j: (b, n_tiles - 1 - j, 0, 0),
                         memory_space=pltpu.VMEM),
            ctx_spec, vm, vm, vm, vm, vm, vm,
            pl.BlockSpec((1, tile, s), rmap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            vm, vm, vm, vm,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, r), x.dtype),
            jax.ShapeDtypeStruct((batch, t_total, r), x.dtype),
            jax.ShapeDtypeStruct((n_layers * batch, 2 * r), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, w_in, 2 * r), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, r, r + s), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, r + s), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_layers, tile, r), jnp.float32),   # hstack
            # d-row anti-causal carry slots (see _bwd_pallas)
            pltpu.VMEM((max(8, sum(dilations)), r), jnp.float32),
            pltpu.VMEM((n_layers, w_in, 2 * r), jnp.float32),
            pltpu.VMEM((n_layers, r, r + s), jnp.float32),
            pltpu.VMEM((n_layers, r + s), jnp.float32),
            pltpu.VMEM((n_layers, 2 * r), jnp.float32),
            pltpu.VMEM((tile, r), jnp.float32),   # _ring_carry stage
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, tails, ctx_arg, b_fg, w_fg, jnp.swapaxes(w_fg, 1, 2),
      w_out, jnp.swapaxes(w_out, 1, 2), b_out, dskip)
    return outs


# -------------------------------------------------------------- backward
def _bwd_pallas(hsave, tfsg, tails, ctx, w_fg, w_out, dskip,
                dilations, interpret: bool, embed=None, x=None,
                b_out=None, ctx_proj=None):
    """embed=(codes2_tb, vocab[, table2]): the first output becomes
    the stacked-table gradient (2V, R) f32 instead of dx (B, T, R).

    hsave=None (all dilations < tile): the kernel rebuilds the h chain
    per tile from tfsg — layer 0's input comes from ``x`` (or the
    embedding rebuilt from ``embed``), and each next h is the residual
    update ``h + gated @ w_res + b_res`` with gated from the saved
    (rounded) taps, bit-identical to what the forward computed.

    ctx_proj=(xc, wup_t): the final 10x video upsample's backward runs
    INSIDE the kernel (round-3 VERDICT item 2b).  xc is the coarse
    (B, T/10, R) pre-upsample activation, wup_t the (10, R, R)
    per-phase transposed projection.  The dctx output then becomes the
    coarse dxc (B, T/10, R) and a 7th output carries the projection's
    ones-augmented weight gradient (10, R+1, R) — the flat (B, T, R)
    dctx, its (T/10, 10R) repack, and the bias-grad batch reduce
    (~0.29 ms/step on the breakdancing config) never touch HBM.  The
    in-kernel split dctx -> (tile/10, 10, R) is a sublane-only reshape
    Mosaic handles at ~copy cost (scripts/probe_ctx_reshape2.py)."""
    n_layers, batch, t_total, two_r = tfsg.shape
    r = two_r // 2
    s = w_out.shape[2] - r
    has_ctx = ctx is not None
    tile = pick_stack_tile(t_total, dilations, ctx=has_ctx)
    n_tiles = t_total // tile
    w_in = w_fg.shape[1]
    small_pad = tails.shape[2]
    save_h = hsave is not None

    # Two-time-tiles-per-pass (round-3 VERDICT item 2a): the backward
    # runs on a MULTIPLE of the forward tile — the forward's per-tile
    # ring snapshots at the multiplied boundaries are still the right
    # boundary state, every d < tile still resolves in-tile, and the
    # kernel body is unchanged.  Halves the sequential grid steps and
    # doubles the wgrad contraction depth per issue; VMEM bounds the
    # multiplier (in-blocks double-buffer, dfgp rings scale with tile).
    #
    # OFF by default: the VMEM estimate below is unreliable — measured
    # 185 MB actual vs ~81 MB estimated on breakdancing (mult=2), and
    # 181.84 MB actual vs ~21 MB estimated on the exp03 shape
    # (L=4, R=32, S=8; compile-time VMEM OOM on v5e, 2026-08-19) — so
    # the auto path only ever fired on configs where it crashed the
    # compile.  Opt in via MOVENET_BWD_TILE_MULT=2|4 after pricing the
    # config with scripts/exp_trunk_bwd.py --tile.
    mult = 1
    want = int(os.environ.get("MOVENET_BWD_TILE_MULT", "1"))
    if want > 1 and not any(d >= tile for d in dilations):
        isz = tfsg.dtype.itemsize
        for cand in (want,):
            if n_tiles % cand:
                continue
            tb = tile * cand
            per_in = tb * (n_layers * r * isz * (3 if save_h else 2)
                           + (r * isz if has_ctx else 0) + s * isz
                           + (tfsg.dtype.itemsize * 0))
            vmem = 2 * per_in + 2 * 2 * tb * r * isz \
                + n_layers * tb * r * 4 \
                + (n_layers * tb * r * 4 if not save_h else 0) \
                + tb * r * 4  # (tile, r) f32 _ring_carry stage scratch
            if vmem <= 40 * 1024 * 1024:
                mult = cand
                break
    tile *= mult
    n_tiles //= mult
    proj = ctx_proj is not None
    assert not proj or (has_ctx and tile % 10 == 0 and
                        t_total % 10 == 0)
    # anti-causal carry: only the d rows of dfg_p that cross a tile
    # boundary persist between grid steps (rows [0, d) of the
    # later-time tile land at rows [tile-d, tile) of the next one
    # processed), so each layer's ring slot is d rows — for d >= tile
    # the whole d-row window (d % tile == 0 by pick_stack_tile).  The
    # former max(d, tile) slots cost 9 full-tile ring reads+writes per
    # grid step (~1.4 GB/step of VMEM traffic on the breakdancing
    # config) for the same exchanged values.
    offs2, total2 = _ring_offsets(dilations)

    # layer-chunked streaming (save mode): stream ck layers of
    # hsave/tfsg per grid step instead of the whole (~46 MB) per-tile
    # block.  Hypothesis was that smaller blocks would double-buffer
    # under the VMEM limit and hide the DMA; MEASURED on v5e
    # (breakdancing config, 16 MB budget -> 3 chunks) the bwd kernel
    # instead fully serializes per chunk step (5.85 -> 12.1 ms) — the
    # monolithic block's partial overlap beats the chunked pipeline.
    # Disabled (budget 0); interpret-tested, re-evaluate per hardware.
    layer_chunk = None
    budget = _BWD_LAYER_CHUNK_BUDGET
    if save_h and budget:
        per_layer = tile * 3 * r * tfsg.dtype.itemsize
        for cand in sorted((d for d in range(1, n_layers)
                            if n_layers % d == 0), reverse=True):
            if cand * per_layer <= budget:
                layer_chunk = cand
                break
    n_chunks = n_layers // layer_chunk if layer_chunk else 1
    grid = (batch, n_tiles, n_chunks) if n_chunks > 1 else \
        (batch, n_tiles)
    if n_chunks == 1:
        layer_chunk = None

    def rmap(b, j, *c):
        return (b, n_tiles - 1 - j, 0)

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    if has_ctx:
        ctx_spec = pl.BlockSpec((1, tile, r), rmap,
                                memory_space=pltpu.VMEM)
        ctx_arg = ctx
    else:
        ctx_spec = pl.BlockSpec((1, 1), lambda b, j, *c: (0, 0),
                                memory_space=pltpu.SMEM)
        ctx_arg = jnp.zeros((1, 1), jnp.int32)

    lck = layer_chunk or n_layers

    def lmap(b, j, *c):
        lc = (n_chunks - 1 - c[0]) if c else 0
        return (lc, b, n_tiles - 1 - j, 0)

    hsave_spec = pl.BlockSpec((lck, 1, tile, r), lmap,
                              memory_space=pltpu.VMEM)
    tfsg_spec = pl.BlockSpec((lck, 1, tile, 2 * r), lmap,
                             memory_space=pltpu.VMEM)
    # tails are written at the FORWARD tiling: index tile-multiplied
    tails_spec = pl.BlockSpec((1, 1, small_pad, r),
                              lambda b, j, *c: (
                                  b, mult * (n_tiles - 1 - j), 0, 0),
                              memory_space=pltpu.VMEM)
    # full previous-tile reloads only for dilations spanning tiles; the
    # d<tile boundary rows come from the forward's ring snapshot
    big_layers = [l for l, d in enumerate(dilations) if d >= tile]
    shift_specs = [
        pl.BlockSpec((1, 1, tile, r),
                     lambda b, j, *c, l=l, d=dilations[l]: (
                         l, b,
                         jnp.maximum((n_tiles - 1 - j) - d // tile, 0),
                         0),
                     memory_space=pltpu.VMEM)
        for l in big_layers
    ]

    if proj:
        xc, wup_t = ctx_proj
        proj_args = (xc, wup_t)
        proj_specs = [pl.BlockSpec((1, tile // 10, r), rmap,
                                   memory_space=pltpu.VMEM), vm]
        dctx_shape = jax.ShapeDtypeStruct((batch, t_total // 10, r),
                                          tfsg.dtype)
        dctx_out_spec = pl.BlockSpec((1, tile // 10, r), rmap,
                                     memory_space=pltpu.VMEM)
        proj_out_shapes = (jax.ShapeDtypeStruct((10, r + 1, r),
                                                jnp.float32),)
        proj_out_specs = (vm,)
        proj_scratch = [pltpu.VMEM((10, r + 1, r), jnp.float32)]
    else:
        proj_args, proj_specs = (), []
        dctx_shape = jax.ShapeDtypeStruct((batch, t_total, r),
                                          tfsg.dtype)
        dctx_out_spec = pl.BlockSpec((1, tile, r), rmap,
                                     memory_space=pltpu.VMEM)
        proj_out_shapes, proj_out_specs, proj_scratch = (), (), []

    in_dtype = tfsg.dtype
    if embed is None:
        embed_args, embed_specs, vocab = (), [], 0
        dx_shape = jax.ShapeDtypeStruct((batch, t_total, r), in_dtype)
        dx_spec = pl.BlockSpec((1, tile, r), rmap,
                               memory_space=pltpu.VMEM)
        embed_scratch = []
    else:
        codes2_tb, vocab = embed[:2]
        code_spec = pl.BlockSpec((tile, codes2_tb.shape[1]),
                                 lambda b, j, *c: (n_tiles - 1 - j, 0),
                                 memory_space=pltpu.VMEM)
        embed_args = (codes2_tb,)
        embed_specs = [code_spec]
        dx_shape = jax.ShapeDtypeStruct((2 * vocab, r), jnp.float32)
        dx_spec = vm
        embed_scratch = [pltpu.VMEM((2 * vocab, r), jnp.float32)]

    if save_h:
        lead_args, lead_specs = (hsave,), [hsave_spec]
        res_args, res_specs = (), []
        h_scratch = []
    else:
        assert not big_layers, "no-hsave backward needs all d < tile"
        if embed is None:
            # layer-0 input: the op's own x block
            lead_args = (x,)
            lead_specs = [pl.BlockSpec((1, tile, r), rmap,
                                       memory_space=pltpu.VMEM)]
        else:
            table2 = embed[2]
            lead_args, lead_specs = (table2,), [vm]
        # residual projection (columns [:r] of w_out) + its bias: the
        # per-layer h update replayed from the saved taps
        res_args = (w_out[:, :, :r], b_out[:, :r])
        res_specs = [vm, vm]
        h_scratch = [pltpu.VMEM((n_layers, tile, r), jnp.float32)]

    carry_scratch = []
    if n_chunks > 1:
        carry_scratch.append(pltpu.VMEM((tile, r), jnp.float32))
        if has_ctx:
            carry_scratch.append(pltpu.VMEM((tile, r), jnp.float32))

    outs = pl.pallas_call(
        _bwd_kernel_padded(tuple(dilations), r, s, has_ctx, tile,
                           n_tiles, batch,
                           in_dtype, tuple(offs2),
                           embed_vocab=vocab, save_h=save_h,
                           layer_chunk=layer_chunk, ctx_proj=proj),
        grid=grid,
        in_specs=lead_specs + [tfsg_spec, tails_spec, ctx_spec, vm, vm,
                               *res_specs,
                               pl.BlockSpec((1, tile, s), rmap,
                                            memory_space=pltpu.VMEM),
                               *embed_specs, *shift_specs, *proj_specs],
        out_specs=(
            dx_spec,
            dctx_out_spec,
            vm, vm, vm, vm, *proj_out_specs,
        ),
        out_shape=(
            dx_shape,
            dctx_shape,
            jax.ShapeDtypeStruct((n_layers * batch, 2 * r), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, w_in, 2 * r), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, r, r + s), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, r + s), jnp.float32),
            *proj_out_shapes,
        ),
        scratch_shapes=embed_scratch + h_scratch + [
            pltpu.VMEM((max(8, total2), r), jnp.float32),
            pltpu.VMEM((n_layers, w_in, 2 * r), jnp.float32),
            pltpu.VMEM((n_layers, r, r + s), jnp.float32),
            pltpu.VMEM((n_layers, r + s), jnp.float32),
            pltpu.VMEM((n_layers, 2 * r), jnp.float32),
            pltpu.VMEM((tile, r), jnp.float32),   # _ring_carry stage
        ] + proj_scratch + carry_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(*lead_args, tfsg, tails, ctx_arg,
      jnp.swapaxes(w_fg, 1, 2), jnp.swapaxes(w_out, 1, 2), *res_args,
      dskip, *embed_args, *([hsave] * len(big_layers)), *proj_args)
    return outs


def _bwd_kernel_padded(dilations, r, s, has_ctx, tile, n_tiles,
                       n_batch, in_dtype, ring_offs,
                       embed_vocab: int = 0, save_h: bool = True,
                       layer_chunk=None, ctx_proj: bool = False):
    """_bwd_kernel with explicit (padded) ring offsets.

    embed_vocab > 0: the layer-0 input gradient is contracted against
    the tile's rebuilt embedding one-hot into a stacked-table gradient
    (2V, R) instead of being written out as dx (B, T, R).

    save_h=False: no per-layer hsave input — the h chain is replayed
    per tile (layer 0's input from x/the rebuilt embedding, then
    ``h += gated @ w_res + b_res`` with gated from the saved rounded
    taps), bit-identical to the forward's residual stream.

    layer_chunk=ck (save_h only): the grid gains a third dimension
    over n_layers//ck layer chunks (highest layers first, matching the
    reverse sweep) so hsave/tfsg stream in ck-layer blocks small
    enough to double-buffer; dh/dctx carry between chunk steps in VMEM
    scratch.  The per-layer math and visit order are IDENTICAL to the
    monolithic kernel."""
    mdt = _BWD_OPERAND_DT or in_dtype
    n_layers = len(dilations)
    ck = layer_chunk or n_layers
    n_chunks = n_layers // ck
    chunked = n_chunks > 1
    assert n_layers % ck == 0
    assert not chunked or save_h
    tail_offs, _, _ = _split_ring_offsets(dilations, tile)
    big_layers = [l for l, d in enumerate(dilations) if d >= tile]
    shift_slot = {l: i for i, l in enumerate(big_layers)}

    def kernel(*refs):
        (lead_ref, tfsg_ref, tails_ref, ctx_ref, w_fg_t_ref,
         w_out_t_ref, *rest) = refs
        if not save_h:
            w_res_ref, b_res_ref, *rest = rest
        dskip_ref, *rest = rest
        if embed_vocab:
            codes_ref, *rest = rest
        shift_refs = rest[:len(big_layers)]
        rest = rest[len(big_layers):]
        if ctx_proj:
            xc_ref, wupt_ref, *rest = rest
        (dx_ref, dctx_ref, db_fg_ref, dw_fg_ref, dw_out_ref,
         db_out_ref, *rest) = rest
        if ctx_proj:
            dwup_ref, *rest = rest
        if embed_vocab:
            dtab_acc, *rest = rest
        if not save_h:
            h_all, *rest = rest
        (dfgp_ring, dwfg_acc, dwout_acc, dbout_acc,
         dbfg_acc, carry_ref, *carries) = rest
        if ctx_proj:
            dwup_acc, *carries = carries
        if chunked:
            dh_carry = carries[0]
            dctx_carry = carries[1] if has_ctx else None

        b_idx = pl.program_id(0)
        rj = pl.program_id(1)
        cj = pl.program_id(2) if chunked else None
        ti = n_tiles - 1 - rj
        t0 = ti * tile
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)

        def with_first_chunk(cond):
            return cond if cj is None else jnp.logical_and(cond, cj == 0)

        @pl.when(with_first_chunk(
            jnp.logical_and(b_idx == 0, rj == 0)))
        def _():
            dwfg_acc[:, :, :] = jnp.zeros(dwfg_acc.shape, jnp.float32)
            dwout_acc[:, :, :] = jnp.zeros(dwout_acc.shape, jnp.float32)
            dbout_acc[:, :] = jnp.zeros(dbout_acc.shape, jnp.float32)
            if embed_vocab:
                dtab_acc[:, :] = jnp.zeros(dtab_acc.shape, jnp.float32)
            if ctx_proj:
                dwup_acc[:, :, :] = jnp.zeros(dwup_acc.shape,
                                              jnp.float32)

        @pl.when(with_first_chunk(rj == 0))
        def _():
            dfgp_ring[:, :] = jnp.zeros(dfgp_ring.shape, jnp.float32)
            dbfg_acc[:, :] = jnp.zeros(dbfg_acc.shape, jnp.float32)

        # ctx / ones feed only MXU operands: keep them in mdt (the
        # stored ctx values are already rounded, so no precision is
        # discarded and no f32 round-trip copies are paid)
        ctx = ctx_ref[0].astype(mdt) if has_ctx else None
        dskip = dskip_ref[0].astype(jnp.float32)
        ones_col = jnp.ones((tile, 1), mdt)
        w_in = (3 if has_ctx else 2) * r

        oh2 = None
        if not save_h:
            # replay the forward's residual stream from the same
            # rounded-gated inputs; on the MXU each res column of
            # w_out contracts independently of the skip columns, so
            # the reconstructed h matches the forward's to summation
            # order (bit-exact on TPU, f32-jitter in interpret mode)
            if embed_vocab:
                oh2 = _embed_onehot(codes_ref, b_idx, tile,
                                    embed_vocab, n_batch)
                h_rec = _mdot(oh2, lead_ref[:, :], in_dtype)
                if in_dtype != jnp.float32:
                    h_rec = h_rec.astype(in_dtype).astype(jnp.float32)
            else:
                h_rec = lead_ref[0].astype(jnp.float32)
            for l in range(n_layers):
                h_all[l] = h_rec
                v = tfsg_ref[l, 0].astype(jnp.float32)
                gated = v[:, :r] * v[:, r:]
                h_rec = h_rec + (_mdot(gated, w_res_ref[l], in_dtype)
                                 + b_res_ref[pl.ds(l, 1), :])

        def do_layer(l, l_loc, dh, dctx_acc):
            d = dilations[l]
            off = ring_offs[l]
            # h / shifted feed only the hp matmul operand: read them in
            # mdt (hsave/tails store already-rounded values, so the
            # cast is exact for bf16 models and identity for f32)
            if save_h:
                h = lead_ref[l_loc, 0].astype(mdt)
            else:
                h = h_all[l].astype(mdt)
            if d >= tile:
                shifted = shift_refs[shift_slot[l]][0, 0].astype(mdt)
                shifted = jnp.where(t0 < d, jnp.zeros_like(shifted),
                                    shifted)
            else:
                # boundary rows from the forward's ring snapshot (zeros
                # at ti == 0 since the ring starts zeroed)
                shifted = jnp.concatenate(
                    [tails_ref[0, 0, pl.ds(tail_offs[l], d), :].astype(
                        mdt), h[: tile - d, :]], axis=0)
            v = tfsg_ref[l_loc, 0].astype(jnp.float32)

            dout = jnp.concatenate([dh, dskip], axis=1)
            dout_m = dout.astype(mdt)             # shared by 2 matmuls
            dgated = jnp.dot(dout_m, w_out_t_ref[l].astype(mdt),
                             preferred_element_type=jnp.float32)
            gated, dfg = _dfg_from_v(v, dgated, r)
            dfg_m = dfg.astype(mdt)               # shared by 2 matmuls

            if _BWD_SPLIT_WGRAD:
                # per-block wgrad matmuls instead of one hp concat: the
                # (tile, W_in+1) concat is a full-tile VPU copy per
                # layer, while wgrad output rows are independent per
                # operand block — [h|ones] (M 65->128), shifted
                # (64->128), ctx (64->128) cost one extra M-chunk vs
                # the concat's 193->256 but skip the copy entirely
                h1 = jnp.concatenate([h, ones_col], axis=1)
                wf_h = jax.lax.dot_general(       # (R+1, 2R)
                    h1, dfg_m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                wf_s = jax.lax.dot_general(       # (R, 2R)
                    shifted, dfg_m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dwfg_acc[l, :r] += wf_h[:r]
                dwfg_acc[l, r:2 * r] += wf_s
                if has_ctx:
                    wf_c = jax.lax.dot_general(   # (R, 2R)
                        ctx, dfg_m, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dwfg_acc[l, 2 * r:] += wf_c
                dbfg_acc[pl.ds(l, 1), :] += wf_h[r: r + 1]
            else:
                # ones-column augmentation: the bias gradients ride the
                # wgrad matmuls as an extra output row (M 192->193 and
                # 64->65 stay within the same MXU chunk counts),
                # replacing two full-tile reduces per layer (-0.6
                # ms/step measured, scripts/exp_trunk_bwd.py
                # 'fold_bias')
                parts = [h, shifted] + ([ctx] if has_ctx else []) \
                    + [ones_col]
                hp = jnp.concatenate(parts, axis=1)  # (tile, W_in+1)
                wf = jax.lax.dot_general(         # (W_in+1, 2R)
                    hp, dfg_m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dwfg_acc[l] += wf[:w_in]
                dbfg_acc[pl.ds(l, 1), :] += wf[w_in: w_in + 1]
            go = jnp.concatenate([gated.astype(mdt), ones_col], axis=1)
            wo = jax.lax.dot_general(             # (R+1, R+S)
                go, dout_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwout_acc[l] += wo[:r]
            dbout_acc[pl.ds(l, 1), :] += wo[r: r + 1]

            dfg_w = jnp.dot(dfg_m, w_fg_t_ref[l].astype(mdt),
                            preferred_element_type=jnp.float32)
            dh = dh + dfg_w[:, :r]
            dfg_p = dfg_w[:, r: 2 * r]
            if d >= tile:
                slot = off + jax.lax.rem(t0, d)
                dh = dh + dfgp_ring[pl.ds(slot, tile), :]
                dfgp_ring[pl.ds(slot, tile), :] = dfg_p
            else:
                # rows [d, tile) of dfg_p flow within the tile; rows
                # [0, d) cross to the previous-time tile and ride the
                # d-row ring slot (same values the old full-tile
                # roll+select exchanged, bit-identically)
                dh = _ring_carry(dh, dfg_p, dfgp_ring, carry_ref,
                                 off, d, tile)
            if has_ctx:
                dctx_acc = dctx_acc + dfg_w[:, 2 * r:]
            return dh, dctx_acc

        def finish(dh, dctx_acc):
            nonlocal oh2
            if embed_vocab:
                # dx_ref doubles as the (2V, R) stacked-table gradient,
                # accumulated in scratch and emitted once at the end
                if oh2 is None:
                    oh2 = _embed_onehot(codes_ref, b_idx, tile,
                                        embed_vocab, n_batch)
                dtab_acc[:, :] += _mdot_t0(oh2, dh, mdt)
            else:
                dx_ref[0] = dh.astype(in_dtype)
            if ctx_proj:
                # final 10x upsample backward, in-VMEM: split the flat
                # dctx into per-phase columns, contract against the
                # coarse activation (ones-augmented: bias grad rides as
                # an extra row) and against the per-phase transposed
                # projection for the coarse input gradient
                tc = tile // 10
                dz3 = dctx_acc.reshape(tc, 10, r)
                xcb = xc_ref[0].astype(mdt)            # (tc, R)
                xc1 = jnp.concatenate(
                    [xcb, jnp.ones((tc, 1), mdt)], axis=1)
                dxc = jnp.zeros((tc, r), jnp.float32)
                for p in range(10):
                    dzp = dz3[:, p, :].astype(mdt)     # (tc, R)
                    dwup_acc[p] += jax.lax.dot_general(
                        xc1, dzp, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dxc = dxc + jnp.dot(
                        dzp, wupt_ref[p].astype(mdt),
                        preferred_element_type=jnp.float32)
                dctx_ref[0] = dxc.astype(in_dtype)
            elif has_ctx:
                dctx_ref[0] = dctx_acc.astype(in_dtype)
            else:
                dctx_ref[0] = jnp.zeros((tile, r), in_dtype)

        if not chunked:
            dh = jnp.zeros((tile, r), jnp.float32)
            dctx_acc = jnp.zeros((tile, r), jnp.float32) \
                if has_ctx else None
            for l in reversed(range(n_layers)):
                dh, dctx_acc = do_layer(l, l, dh, dctx_acc)
            finish(dh, dctx_acc)
        else:
            for c in range(n_chunks):
                @pl.when(cj == c)
                def _(c=c):
                    lo = n_layers - (c + 1) * ck
                    if c == 0:
                        dh = jnp.zeros((tile, r), jnp.float32)
                        dctx_acc = jnp.zeros((tile, r), jnp.float32) \
                            if has_ctx else None
                    else:
                        dh = dh_carry[:, :]
                        dctx_acc = dctx_carry[:, :] if has_ctx else None
                    for i in reversed(range(ck)):
                        dh, dctx_acc = do_layer(lo + i, i, dh,
                                                dctx_acc)
                    if c == n_chunks - 1:
                        finish(dh, dctx_acc)
                    else:
                        dh_carry[:, :] = dh
                        if has_ctx:
                            dctx_carry[:, :] = dctx_acc

        def with_last_chunk(cond):
            return cond if cj is None else \
                jnp.logical_and(cond, cj == n_chunks - 1)

        @pl.when(with_last_chunk(rj == n_tiles - 1))
        def _():
            for l in range(n_layers):
                db_fg_ref[pl.ds(l * n_batch + b_idx, 1), :] = \
                    dbfg_acc[pl.ds(l, 1), :]

        @pl.when(with_last_chunk(jnp.logical_and(
            b_idx == n_batch - 1, rj == n_tiles - 1)))
        def _():
            dw_fg_ref[:, :, :] = dwfg_acc[:, :, :]
            dw_out_ref[:, :, :] = dwout_acc[:, :, :]
            db_out_ref[:, :] = dbout_acc[:, :]
            if embed_vocab:
                dx_ref[:, :] = dtab_acc[:, :].astype(dx_ref.dtype)
            if ctx_proj:
                dwup_ref[:, :, :] = dwup_acc[:, :, :]

    return kernel


def ctx_is_proj(ctx) -> bool:
    """True when ctx is the (xc, wup, bup) coarse-projection triple:
    xc (B, T/10, R) pre-final-upsample video features, wup (R, 10R) /
    bup (10R,) the final stride-10 upsample projection (the reference's
    last ConvTranspose1d, wavenet.py:102-118).  The backward of the
    projection then runs inside the trunk kernel (see _bwd_pallas)."""
    return isinstance(ctx, (tuple, list)) and len(ctx) == 3


def ctx_flatten(ctx, dtype):
    """(xc, wup, bup) -> flat (B, T, R) conditioning, bit-identical to
    the VideoEncoder's own final Dense + reshape."""
    xc, wup, bup = ctx
    b, tc, r = xc.shape
    dtype = jnp.dtype(dtype)
    prec = jax.lax.Precision.HIGHEST \
        if dtype == jnp.dtype(jnp.float32) else None
    z = jnp.dot(xc.astype(dtype), wup.astype(dtype), precision=prec,
                preferred_element_type=dtype) + bup.astype(dtype)
    return z.reshape(b, tc * 10, r)


def _ctx_proj_args(ctx):
    """(xc, wup_t) kernel inputs from the projection triple."""
    xc, wup, _ = ctx
    r = xc.shape[-1]
    wup_t = wup.reshape(r, 10, r).transpose(1, 2, 0)   # (10, R, R): W_p^T
    return xc, wup_t


def _ctx_proj_grads(dwup_aug, ctx):
    """Kernel (10, R+1, R) ones-augmented grad -> (dwup, dbup) matching
    the flax Dense parameter shapes."""
    xc, wup, bup = ctx
    r = xc.shape[-1]
    dwup = dwup_aug[:, :r, :].transpose(1, 0, 2).reshape(r, 10 * r)
    dbup = dwup_aug[:, r, :].reshape(10 * r)
    return dwup.astype(wup.dtype), dbup.astype(bup.dtype)


# ------------------------------------------------------------ public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_stack(x, ctx, b_fg, w_fg, w_out, b_out, dilations: tuple,
                interpret: bool = False, strategy: str = "auto"):
    """All gated blocks in one kernel.

    Args:
      x: (B, T, R) front-conv output.
      ctx: (B, T, R) or None.
      b_fg: (L*B, 2R) per-(layer, batch) fg bias rows.
      w_fg: (L, 2R|3R, 2R); w_out: (L, R, R+S); b_out: (L, R+S).
      strategy: VJP memory strategy — "save" (keep per-layer inputs,
        fastest), "recompute" (per-tile ring snapshots only, O(sum d)
        memory), or "auto" (save unless hsave exceeds the HBM budget).
        See resolve_strategy.
    Returns:
      skip_sum (B, T, S).
    """
    mode = resolve_strategy(strategy, x.shape, len(dilations), dilations,
                            x.dtype.itemsize)
    ctx_flat = ctx_flatten(ctx, x.dtype) if ctx_is_proj(ctx) else ctx
    if mode == "recompute":
        skip, _ = _fwd_pallas_tails(x, ctx_flat, b_fg, w_fg, w_out,
                                    b_out, dilations, interpret)
    else:
        skip, _, _, _ = _fwd_pallas(x, ctx_flat, b_fg, w_fg, w_out,
                                    b_out, dilations, interpret,
                                    save_h=mode != "replay")
    return skip


def _fs_fwd(x, ctx, b_fg, w_fg, w_out, b_out, dilations, interpret,
            strategy):
    mode = resolve_strategy(strategy, x.shape, len(dilations), dilations,
                            x.dtype.itemsize)
    proj = ctx_is_proj(ctx)
    ctx_flat = ctx_flatten(ctx, x.dtype) if proj else ctx
    if mode == "recompute":
        skip, tails = _fwd_pallas_tails(x, ctx_flat, b_fg, w_fg, w_out,
                                        b_out, dilations, interpret)
        return skip, (x, tails, ctx_flat, b_fg, w_fg, w_out, b_out,
                      ctx if proj else None)
    skip, hsave, tfsg, tails = _fwd_pallas(x, ctx_flat, b_fg, w_fg,
                                           w_out, b_out, dilations,
                                           interpret,
                                           save_h=mode != "replay")
    return skip, (x, hsave, tfsg, tails, ctx_flat, w_fg, w_out, b_out,
                  ctx if proj else None)


def _fs_bwd(dilations, interpret, strategy, saved, dskip):
    if len(saved) == 8:  # recompute mode residuals
        x, tails, ctx, b_fg, w_fg, w_out, b_out, proj_ctx = saved
        dx, dctx, db_fg, dw_fg, dw_out, db_out = _bwd_pallas_tails(
            x, tails, ctx, b_fg, w_fg, w_out, b_out, dskip, dilations,
            interpret)
        dwup_aug = None
    else:
        x, hsave, tfsg, tails, ctx, w_fg, w_out, b_out, proj_ctx = saved
        cp = _ctx_proj_args(proj_ctx) if proj_ctx is not None else None
        outs = _bwd_pallas(
            hsave, tfsg, tails, ctx, w_fg, w_out, dskip, dilations,
            interpret, x=x, b_out=b_out, ctx_proj=cp)
        dx, dctx, db_fg, dw_fg, dw_out, db_out = outs[:6]
        dwup_aug = outs[6] if proj_ctx is not None else None
    if proj_ctx is not None:
        if dwup_aug is None:
            # tails path has no in-kernel projection backward: fold the
            # flat dctx through the projection in XLA
            dctx, dwup_aug = _ctx_proj_fold_xla(dctx, proj_ctx)
        xc = proj_ctx[0]
        dwup, dbup = _ctx_proj_grads(dwup_aug, proj_ctx)
        dctx = (dctx.astype(xc.dtype), dwup, dbup)
    elif ctx is None:
        dctx = None
    return (dx, dctx, db_fg.astype(jnp.float32),
            dw_fg.astype(w_fg.dtype), dw_out.astype(w_out.dtype),
            db_out.astype(jnp.float32))


def _ctx_proj_fold_xla(dctx_flat, proj_ctx):
    """Flat (B, T, R) dctx -> (dxc, ones-augmented (10, R+1, R) weight
    grad) via XLA ops — the fallback when the kernel didn't fold the
    projection backward itself."""
    xc, wup, _ = proj_ctx
    b, tc, r = xc.shape
    dz = dctx_flat.astype(jnp.float32).reshape(b, tc, 10, r)
    xcf = xc.astype(jnp.float32)
    dw = jnp.einsum("bqe,bqpr->per", xcf, dz)          # (10, R, R)
    db = dz.sum(axis=(0, 1))                           # (10, R)
    dwup_aug = jnp.concatenate([dw, db[:, None, :]], axis=1)
    wup3 = wup.astype(jnp.float32).reshape(r, 10, r)
    dxc = jnp.einsum("bqpr,epr->bqe", dz, wup3)
    return dxc, dwup_aug


fused_stack.defvjp(_fs_fwd, _fs_bwd)


# ----------------------------------- public op (embedded front conv)
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_stack_embed(codes2_tb, table2, ctx, b_fg,
                      w_fg, w_out, b_out, dilations: tuple,
                      compute_dtype, interpret: bool = False):
    """fused_stack with the front causal-conv embedding folded INTO
    the kernel (save strategy only).

    The XLA formulation (models/fused._front_embed) materializes the
    (B, T, 2V) one-hot and the (B, T, R) embedding h in HBM in the
    forward, and again in the backward (~0.5 ms/step on the
    breakdancing config); here each tile rebuilds its (tile, 2V)
    one-hot in VMEM (3 VPU ops), h costs one K=2V matmul, and the
    backward contracts the layer-0 gradient against the same one-hot
    into the stacked-table gradient without ever writing dx.

    Args:
      codes2_tb: (T, kB) int32 packed time-major codes, k >= 2: column
        b holds codes[b], column B + b holds codes[b] shifted one step
        right with row 0 a sentinel OUTSIDE [0, V) (no past tap at
        t=0).  Extra columns (e.g. CE targets riding the same relayout)
        are ignored here.
      table2: (2V, R) stacked [front_cur; front_past] table, in the
        compute dtype.
      Remaining args as fused_stack.
    Returns:
      skip_sum (B, T, S) in compute_dtype.
    """
    batch = b_fg.shape[0] // w_fg.shape[0]
    ctx_flat = ctx_flatten(ctx, jnp.dtype(compute_dtype)) \
        if ctx_is_proj(ctx) else ctx
    skip, _, _, _ = _fwd_pallas(
        None, ctx_flat, b_fg, w_fg, w_out, b_out, dilations, interpret,
        embed=(codes2_tb, table2, batch), dtype=compute_dtype)
    return skip


def _fse_fwd(codes2_tb, table2, ctx, b_fg, w_fg, w_out,
             b_out, dilations, compute_dtype, interpret):
    batch = b_fg.shape[0] // w_fg.shape[0]
    proj = ctx_is_proj(ctx)
    ctx_flat = ctx_flatten(ctx, jnp.dtype(compute_dtype)) if proj \
        else ctx
    skip, hsave, tfsg, tails = _fwd_pallas(
        None, ctx_flat, b_fg, w_fg, w_out, b_out, dilations, interpret,
        embed=(codes2_tb, table2, batch), dtype=compute_dtype)
    return skip, (hsave, tfsg, tails, ctx_flat, w_fg, w_out, b_out,
                  codes2_tb, table2, ctx if proj else None)


def _fse_bwd(dilations, compute_dtype, interpret, saved, dskip):
    (hsave, tfsg, tails, ctx, w_fg, w_out, b_out,
     codes2_tb, table2, proj_ctx) = saved
    vocab = table2.shape[0] // 2
    cp = _ctx_proj_args(proj_ctx) if proj_ctx is not None else None
    outs = _bwd_pallas(
        hsave, tfsg, tails, ctx, w_fg, w_out, dskip, dilations,
        interpret, embed=(codes2_tb, vocab, table2),
        b_out=b_out, ctx_proj=cp)
    dtab, dctx, db_fg, dw_fg, dw_out, db_out = outs[:6]
    if proj_ctx is not None:
        xc = proj_ctx[0]
        dwup, dbup = _ctx_proj_grads(outs[6], proj_ctx)
        dctx = (dctx.astype(xc.dtype), dwup, dbup)
    elif ctx is None:
        dctx = None
    return (None, dtab.astype(table2.dtype), dctx,
            db_fg.astype(jnp.float32), dw_fg.astype(w_fg.dtype),
            dw_out.astype(w_out.dtype), db_out.astype(jnp.float32))


fused_stack_embed.defvjp(_fse_fwd, _fse_bwd)
