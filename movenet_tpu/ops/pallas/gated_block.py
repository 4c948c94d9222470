"""Fused gated-residual-block kernels (training path), Pallas TPU.

One gated block = tap matmuls + PixelCNN gating + residual/skip
projections (models/wavenet.py GatedResidualBlock).  Under XLA this
materializes fg/gated intermediates in HBM and reads the residual
stream several times per layer; this module fuses the whole block into
one kernel per direction with a custom VJP:

  forward:  grid (B, T/TILE) runs time tiles SEQUENTIALLY; a persistent
            VMEM ring buffer carries the last `dilation` rows of h
            across tiles (the tile-granular version of the sampler's
            ring buffer), so the causal shift costs no HBM copy.  The
            packed [h | h_shift (| ctx)] tile feeds a single
            (TILE, 2R|3R) x (2R|3R, 2R) MXU matmul (full-depth
            contraction instead of two half-depth ones).
  backward: the same grid iterated in REVERSE time order; an
            anti-causal ring buffer carries dfg @ W_past^T from future
            tiles into dh[t] += (dfg @ Wp^T)[t+d].  fg/tanh/sigmoid are
            recomputed from the saved h (remat-in-kernel; the shifted
            slice is re-read from the saved h array), weight/bias
            gradients accumulate in f32 VMEM scratch and are emitted at
            the final grid step.

Constraints: T divisible by TILE (512); dilations are powers of two
(so tile boundaries align with the shift for d >= TILE).  Numerics use
fp32 MXU accumulation; equivalence and gradient tests pin the op
against the unfused flax block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # minimum granularity: T must be a multiple of this


def _pick_tile(t: int, d: int, cap: int = 4000) -> int:
    """Largest efficient tile: divides T, multiple of 8 sublanes,
    compatible with the dilation ring (d < tile, or tile | d), and at
    most ``cap`` rows (VMEM budget; the backward kernel keeps more live
    tensors and uses a smaller cap)."""
    for tile in (16000, 8000, 4000, 2000, 1600, 1000, 800, 512, 500,
                 400, 256, 200, 128, 64, 32, 16, 8):
        if tile > cap or t % tile or tile % 8:
            continue
        if d < tile or d % tile == 0:
            return tile
    raise ValueError(f"no valid tile for T={t}, dilation={d}")


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t0(a, b):
    """a^T @ b with the contraction on axis 0 of both (no transpose)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mdot(a, b, dt):
    """Matmul with OPERANDS in the model's compute dtype, f32 accum.

    Mosaic lowers an f32 x f32 dot as a multi-pass bf16 decomposition —
    measured 1.76x slower than bf16 operands at the trunk's (4000, 192)
    x (192, 128) shape (scripts/probe_mxu_dtype.py, v5e).  Casting the
    operands to the compute dtype runs the MXU single-pass AND matches
    the XLA path's semantics exactly: the unfused model computes every
    matmul in compute_dtype (wavenet.py dense()).  dt=float32 is the
    identity, so parity-mode models and the f32 equivalence tests are
    bit-unchanged.  The in-kernel astype is fused into the MXU feed
    (bf16-store vs f32-store+cast measured equal in the probe)."""
    return jnp.dot(a.astype(dt), b.astype(dt),
                   preferred_element_type=jnp.float32)


def _mdot_t0(a, b, dt):
    """_dot_t0 with operands in the compute dtype (see _mdot)."""
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# --------------------------------------------------------------- forward
def _fwd_kernel(d: int, r: int, has_ctx: bool, out_dtype, tile: int):
    def kernel(h_ref, ctx_ref, b_fg_ref, w_fg_ref, w_out_ref, b_out_ref,
               res_ref, skip_ref, tail_ref):
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)
        t0 = ti * tile

        @pl.when(ti == 0)
        def _():
            tail_ref[:, :] = jnp.zeros(tail_ref.shape, jnp.float32)

        h = h_ref[0].astype(jnp.float32)                  # (tile, R)
        if d >= tile:
            slot = jax.lax.rem(t0, d)
            shifted = tail_ref[pl.ds(slot, tile), :]
            tail_ref[pl.ds(slot, tile), :] = h
        else:
            shifted = jnp.concatenate([tail_ref[pl.ds(0, d), :],
                                       h[: tile - d, :]], axis=0)
            tail_ref[pl.ds(0, d), :] = h[tile - d:, :]

        parts = [h, shifted]
        if has_ctx:
            parts.append(ctx_ref[0].astype(jnp.float32))
        hp = jnp.concatenate(parts, axis=1)               # (TILE, 2R|3R)
        fg = _dot(hp, w_fg_ref[:, :]) + b_fg_ref[pl.ds(b_idx, 1), :]
        gated = jnp.tanh(fg[:, :r]) * jax.nn.sigmoid(fg[:, r:])
        out = _dot(gated, w_out_ref[:, :]) + b_out_ref[pl.ds(0, 1), :]
        res_ref[0] = (out[:, :r] + h).astype(out_dtype)
        skip_ref[0] = out[:, r:].astype(out_dtype)

    return kernel


def _fwd_pallas(h, ctx, b_fg, w_fg, w_out, b_out, d: int,
                interpret: bool):
    batch, t_total, r = h.shape
    s = w_out.shape[1] - r
    has_ctx = ctx is not None
    tile = _pick_tile(t_total, d)
    n_tiles = t_total // tile

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
    return pl.pallas_call(
        _fwd_kernel(d, r, has_ctx, h.dtype, tile),
        grid=(batch, n_tiles),
        in_specs=[pl.BlockSpec((1, tile, r), tmap,
                               memory_space=pltpu.VMEM),
                  ctx_spec, vm, vm, vm, vm],
        out_specs=(
            pl.BlockSpec((1, tile, r), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, s), tmap, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, r), h.dtype),
            jax.ShapeDtypeStruct((batch, t_total, s), h.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((max(d, tile), r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(h, ctx_arg, b_fg, w_fg, w_out, b_out)


# -------------------------------------------------------------- backward
def _bwd_kernel(d: int, r: int, has_ctx: bool, n_tiles: int,
                n_batch: int, in_dtype, tile: int):
    def kernel(h_ref, h_shift_ref, ctx_ref, b_fg_ref, w_fg_ref,
               w_fg_t_ref, w_out_ref, w_out_t_ref, dres_ref, dskip_ref,
               dh_ref, dctx_ref, db_fg_ref, dw_fg_ref, dw_out_ref,
               db_out_ref,
               dfgp_tail, dwfg_acc, dwout_acc, dbout_acc, dbfg_acc):
        b_idx = pl.program_id(0)
        rj = pl.program_id(1)              # reverse tile counter
        ti = n_tiles - 1 - rj
        t0 = ti * tile

        @pl.when(jnp.logical_and(b_idx == 0, rj == 0))
        def _():
            dwfg_acc[:, :] = jnp.zeros(dwfg_acc.shape, jnp.float32)
            dwout_acc[:, :] = jnp.zeros(dwout_acc.shape, jnp.float32)
            dbout_acc[:, :] = jnp.zeros(dbout_acc.shape, jnp.float32)

        @pl.when(rj == 0)
        def _():
            dfgp_tail[:, :] = jnp.zeros(dfgp_tail.shape, jnp.float32)
            dbfg_acc[:, :] = jnp.zeros(dbfg_acc.shape, jnp.float32)

        h = h_ref[0].astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        # ---- recompute the forward shifted slice h[t-d]
        if d >= tile:
            # block spec delivered tile (ti - d/TILE), or tile 0 clamped;
            # rows with t < d are the zero left-pad
            shifted = h_shift_ref[0].astype(jnp.float32)
            shifted = jnp.where(ti * tile < d,
                                jnp.zeros_like(shifted), shifted)
        else:
            # shifted[i] = prev[TILE-d+i] for i < d else h[i-d]; built
            # from full-tile rolls (Mosaic rejects offset-slice concats)
            prev = h_shift_ref[0].astype(jnp.float32)
            prev = jnp.where(ti == 0, jnp.zeros_like(prev), prev)
            shifted = jnp.where(row < d,
                                pltpu.roll(prev, d, 0),
                                pltpu.roll(h, d, 0))

        parts = [h, shifted]
        if has_ctx:
            parts.append(ctx_ref[0].astype(jnp.float32))
        hp = jnp.concatenate(parts, axis=1)
        fg = _dot(hp, w_fg_ref[:, :]) + b_fg_ref[pl.ds(b_idx, 1), :]
        tf = jnp.tanh(fg[:, :r])
        sg = jax.nn.sigmoid(fg[:, r:])
        gated = tf * sg

        dres = dres_ref[0].astype(jnp.float32)
        dskip = dskip_ref[0].astype(jnp.float32)
        dout = jnp.concatenate([dres, dskip], axis=1)     # (TILE, R+S)
        dgated = _dot(dout, w_out_t_ref[:, :])            # (TILE, R)
        df = dgated * sg * (1.0 - tf * tf)
        dg = dgated * tf * sg * (1.0 - sg)
        dfg = jnp.concatenate([df, dg], axis=1)           # (TILE, 2R)

        # ---- weight/bias grads (accumulate across all tiles/batches)
        dwfg_acc[:, :] += _dot_t0(hp, dfg)
        dwout_acc[:, :] += _dot_t0(gated, dout)
        dbout_acc[:, :] += jnp.sum(dout, axis=0, keepdims=True)
        dbfg_acc[:, :] += jnp.sum(dfg, axis=0, keepdims=True)

        # ---- input grads.  w_fg_t rows: [cur | past (| ctx)] -> R each
        dfg_w = _dot(dfg, w_fg_t_ref[:, :])               # (TILE, 2R|3R)
        dh = dres + dfg_w[:, :r]
        dfg_p = dfg_w[:, r: 2 * r]                        # past-tap part
        # anti-causal: dh[t] += dfg_p[t + d] (arrives from future tiles)
        if d >= tile:
            slot = jax.lax.rem(t0, d)
            dh = dh + dfgp_tail[pl.ds(slot, tile), :]
            dfgp_tail[pl.ds(slot, tile), :] = dfg_p
        else:
            # future[i] = dfg_p[i+d] for i < tile-d else saved[i+d-tile]
            saved = dfgp_tail[pl.ds(0, tile), :]
            future = jnp.where(row < tile - d,
                               pltpu.roll(dfg_p, tile - d, 0),
                               pltpu.roll(saved, tile - d, 0))
            dh = dh + future
            dfgp_tail[pl.ds(0, tile), :] = dfg_p
        dh_ref[0] = dh.astype(in_dtype)
        if has_ctx:
            dctx_ref[0] = dfg_w[:, 2 * r:].astype(in_dtype)
        else:
            dctx_ref[0] = jnp.zeros((tile, r), in_dtype)

        @pl.when(rj == n_tiles - 1)
        def _():
            db_fg_ref[pl.ds(b_idx, 1), :] = dbfg_acc[:, :]

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 rj == n_tiles - 1))
        def _():
            dw_fg_ref[:, :] = dwfg_acc[:, :]
            dw_out_ref[:, :] = dwout_acc[:, :]
            db_out_ref[:, :] = dbout_acc[:, :]

    return kernel


def _bwd_pallas(h, ctx, b_fg, w_fg, w_out, dres, dskip, d: int,
                interpret: bool):
    batch, t_total, r = h.shape
    s = w_out.shape[1] - r
    has_ctx = ctx is not None
    tile = _pick_tile(t_total, d, cap=4000)
    n_tiles = t_total // tile
    w_in = w_fg.shape[0]

    def rmap(b, j):
        return (b, n_tiles - 1 - j, 0)

    def rmap_shift(b, j):
        ti = n_tiles - 1 - j
        if d >= tile:
            return (b, jnp.maximum(ti - d // tile, 0), 0)
        return (b, jnp.maximum(ti - 1, 0), 0)

    if has_ctx:
        ctx_spec = pl.BlockSpec((1, tile, r), rmap,
                                memory_space=pltpu.VMEM)
        ctx_arg = ctx
    else:
        ctx_spec = pl.BlockSpec((1, 1), lambda b, j: (0, 0),
                                memory_space=pltpu.SMEM)
        ctx_arg = jnp.zeros((1, 1), jnp.int32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    dh, dctx, db_fg, dw_fg, dw_out, db_out = pl.pallas_call(
        _bwd_kernel(d, r, has_ctx, n_tiles, batch, h.dtype, tile),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), rmap_shift,
                         memory_space=pltpu.VMEM),
            ctx_spec, vm, vm, vm, vm, vm,
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, s), rmap, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, r), rmap, memory_space=pltpu.VMEM),
            vm, vm, vm, vm,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, r), h.dtype),   # dh
            jax.ShapeDtypeStruct((batch, t_total, r), h.dtype),   # dctx
            jax.ShapeDtypeStruct((batch, 2 * r), jnp.float32),    # db_fg
            jax.ShapeDtypeStruct((w_in, 2 * r), jnp.float32),     # dw_fg
            jax.ShapeDtypeStruct((r, r + s), jnp.float32),        # dw_out
            jax.ShapeDtypeStruct((1, r + s), jnp.float32),        # db_out
        ),
        scratch_shapes=[
            pltpu.VMEM((max(d, tile), r), jnp.float32),    # dfg_p store
            pltpu.VMEM((w_in, 2 * r), jnp.float32),
            pltpu.VMEM((r, r + s), jnp.float32),
            pltpu.VMEM((1, r + s), jnp.float32),
            pltpu.VMEM((1, 2 * r), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(h, h, ctx_arg, b_fg, w_fg,
      jnp.swapaxes(w_fg, 0, 1), w_out, jnp.swapaxes(w_out, 0, 1),
      dres, dskip)
    return dh, dctx, db_fg, dw_fg, dw_out, db_out


# ------------------------------------------------------------ public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_gated_block(h, ctx, b_fg, w_fg, w_out, b_out,
                      dilation: int, interpret: bool = False):
    """Fused gated residual block.

    Args:
      h: (B, T, R) residual-stream input; T must be a multiple of 128.
      ctx: (B, T, R) context features or None.
      b_fg: (B, 2R) per-example fg bias (context-conv bias + global
        shift folded in; zeros otherwise).
      w_fg: (2R or 3R, 2R) packed [cur; past (; ctx)] tap weights.
      w_out: (R, R+S) packed [residual | skip] projection.
      b_out: (1, R+S) bias.
      dilation: causal lag (power of two).
    Returns:
      (res (B,T,R), skip (B,T,S)).
    """
    return _fwd_pallas(h, ctx, b_fg, w_fg, w_out, b_out, dilation,
                       interpret)


def _fused_fwd(h, ctx, b_fg, w_fg, w_out, b_out, dilation, interpret):
    out = _fwd_pallas(h, ctx, b_fg, w_fg, w_out, b_out, dilation,
                      interpret)
    return out, (h, ctx, b_fg, w_fg, w_out)


def _fused_bwd(dilation, interpret, saved, grads):
    h, ctx, b_fg, w_fg, w_out = saved
    dres, dskip = grads
    dh, dctx, db_fg, dw_fg, dw_out, db_out = _bwd_pallas(
        h, ctx, b_fg, w_fg, w_out, dres, dskip, dilation, interpret)
    if ctx is None:
        dctx = None
    return (dh, dctx, db_fg.astype(b_fg.dtype),
            dw_fg.astype(w_fg.dtype), dw_out.astype(w_out.dtype),
            db_out.astype(jnp.float32))


fused_gated_block.defvjp(_fused_fwd, _fused_bwd)
