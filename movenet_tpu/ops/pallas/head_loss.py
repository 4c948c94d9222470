"""Fused output-head + cross-entropy kernel (training path).

The head (two 1x1 convs) plus the CE loss materialize several
(B, T, C) float32 tensors in HBM (~10 ms/step at the breakdancing
config: logits, probabilities, and their backward twins).  This kernel
computes the scalar loss directly from the skip accumulator, tile by
tile, never materializing logits:

  forward:  per (batch, time-tile): y = leaky(skip) @ W1 + b1;
            z = leaky(y) @ W2 + b2; per-position NLL
            (parity: lse(softmax(z)) - softmax(z)[y];
             clean:  lse(z) - z[y]) and argmax-match counts are masked
            to the valid region [RF-1, T-1) and accumulated in SMEM-like
            VMEM scalars, emitted once.
  backward: reads the forward's f32 softmax save (p) and recomputes
            only y per tile, applies the analytic dL/dz (parity:
            p (.) g - p * (p.g), g = softmax(p) - onehot; clean:
            p - onehot), backprops the two matmuls, and accumulates
            the head weight/bias grads in f32 VMEM scratch.

Outputs are (loss_sum, match_count); the caller divides by the valid
count.  Equivalence with the XLA formulation (values and all grads) is
pinned by tests/test_head_loss_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from movenet_tpu.ops.pallas.gated_block import (
    _dot,
    _dot_t0,
    _mdot,
    _mdot_t0,
    _pick_tile,
)


def _leaky(x):
    return jnp.where(x > 0, x, 0.01 * x)


def _dleaky(x):
    return jnp.where(x > 0, 1.0, 0.01)


def _core(skip, tgt_col, w1, b1, w2, b2, c: int, parity: bool,
          op_dt=jnp.float32):
    """Shared per-tile forward: (y_pre, z, p_or_none, onehot, zmax).

    ``op_dt``: matmul operand dtype (the model compute dtype; see
    gated_block._mdot) — z still accumulates in f32 and ALL softmax /
    probability algebra below stays exact f32 VPU math.
    The softmax is manual so its row max can be shared with
    _match_rows (jax.nn.softmax would compute its own)."""
    act = _leaky(skip)
    y = _mdot(act, w1, op_dt) + b1
    z = _mdot(_leaky(y), w2, op_dt) + b2              # (tile, C)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    onehot = (col == tgt_col).astype(jnp.float32)
    zmax = jnp.max(z, axis=-1, keepdims=True)
    p = None
    if parity:
        e = jnp.exp(z - zmax)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
    return y, z, p, onehot, zmax


def _nll_rows(z, p, onehot, parity: bool, zmax=None):
    if parity:
        # p in [0, 1] so exp(p) <= e: the max-subtraction stabilizer
        # is unnecessary — one exp + sum + log per row
        lse = jnp.log(jnp.sum(jnp.exp(p), axis=-1, keepdims=True))
        picked = jnp.sum(p * onehot, axis=-1, keepdims=True)
    else:
        zm = zmax if zmax is not None \
            else jnp.max(z, axis=-1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(z - zm), axis=-1,
                              keepdims=True)) + zm
        picked = jnp.sum(z * onehot, axis=-1, keepdims=True)
    return lse - picked                                # (tile, 1)


def _match_rows(z, tgt_col, zmax=None):
    # first-max index == target (matches jnp.argmax semantics):
    # target holds the max AND no earlier column ties it.  Formulated
    # as cross-lane float sums — the int-min reduction Mosaic emits for
    # the where/min formulation costs ~1 ms/step on v5e.
    m = zmax if zmax is not None else jnp.max(z, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    is_max = (z == m).astype(jnp.float32)
    onehot = (col == tgt_col).astype(jnp.float32)
    picked_max = jnp.sum(is_max * onehot, axis=-1, keepdims=True)
    earlier = jnp.sum(is_max * (col < tgt_col).astype(jnp.float32),
                      axis=-1, keepdims=True)
    return picked_max * (earlier < 0.5).astype(jnp.float32)


# ---------------------------------------------------------------------
# packed path (s == c == 64): TWO time positions per 128-lane row.
#
# At 64 classes every head tensor half-fills the VPU lanes; packing the
# even position into lanes [0,64) and the odd into [64,128) makes all
# elementwise work dense, the head matmuls ride block-diagonal
# (128, 128) weights (MXU-neutral: same chunk count, half the rows),
# and the per-class reductions become ONE matmul against a
# block-diagonal ones matrix (each lane receives its group's sum).
# The per-group max comes from two half-lane reduces (cheap at half
# the rows).  Group-sum broadcasts replicate each scalar across its 64
# lanes, so scalar accumulations divide by 64.
# ---------------------------------------------------------------------
def _bd(w):
    """(64, 64) -> (128, 128) block-diagonal [w 0; 0 w]."""
    z = jnp.zeros((128, 128), jnp.float32)
    return z.at[:64, :64].set(w).at[64:, 64:].set(w)


def _seg_sum(x, in_hi):
    """Exact per-group sum, broadcast back to every lane of the group.

    MUST be VPU reduces, not a matmul against a block-diagonal ones
    matrix: MXU dots at default precision round the operands, and a
    ~1e-3 relative error on the softmax/probability algebra is a
    systematic gradient bias that measurably degrades training (the
    sine-overfit drive diverges) even though one-step grads look fine.
    """
    s_e = jnp.sum(x[:, :64], axis=-1, keepdims=True)
    s_o = jnp.sum(x[:, 64:], axis=-1, keepdims=True)
    return jnp.where(in_hi, s_o, s_e)


def _packed_meta(tile2: int, batch: int, b_idx, tgt2):
    """Per-lane target / class-index / group metadata for one packed
    tile: returns (onehot, tgt_lane, cls, in_hi) as (tile2, 128)."""
    lane2b = jax.lax.broadcasted_iota(jnp.int32, tgt2.shape, 1)
    tgt2 = tgt2.astype(jnp.int32)    # the pack may arrive int16
    tgt_e = jnp.sum(jnp.where(lane2b == b_idx, tgt2, 0), axis=1,
                    keepdims=True)
    tgt_o = jnp.sum(jnp.where(lane2b == batch + b_idx, tgt2, 0),
                    axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile2, 128), 1)
    in_hi = lane >= 64
    tgt_lane = jnp.where(in_hi, tgt_o + 64, tgt_e)     # lane of target
    onehot = (lane == tgt_lane).astype(jnp.float32)
    cls = lane - jnp.where(in_hi, 64, 0)               # class in group
    tgt_cls = jnp.where(in_hi, tgt_o, tgt_e)
    return onehot, tgt_cls, cls, in_hi


def _packed_core(sk, w1bd, b1b, w2bd, b2b, in_hi, parity: bool):
    """(y, z, m, e, seg, p): head forward on a packed tile."""
    act = _leaky(sk)
    y = _dot(act, w1bd) + b1b
    z = _dot(_leaky(y), w2bd) + b2b
    m_e = jnp.max(z[:, :64], axis=-1, keepdims=True)
    m_o = jnp.max(z[:, 64:], axis=-1, keepdims=True)
    m = jnp.where(in_hi, m_o, m_e)
    e = jnp.exp(z - m)
    seg = _seg_sum(e, in_hi)
    p = e / seg if parity else None
    return y, z, m, e, seg, p


def _fwd_kernel_packed(rf: int, t_total: int, parity: bool, tile2: int,
                       n_tiles: int, n_batch: int):
    def kernel(skip2_ref, tgt2_ref, w1bd_ref, b1b_ref, w2bd_ref,
               b2b_ref, loss_ref, match_ref, acc_ref):
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)

        @pl.when(jnp.logical_and(b_idx == 0, ti == 0))
        def _():
            acc_ref[0, 0] = 0.0
            acc_ref[0, 1] = 0.0

        sk = skip2_ref[0].astype(jnp.float32)            # (tile2, 128)
        onehot, tgt_cls, cls, in_hi = _packed_meta(
            tile2, n_batch, b_idx, tgt2_ref[:, :])
        _, z, m, e, seg, p = _packed_core(
            sk, w1bd_ref[:, :], b1b_ref[pl.ds(0, 1), :],
            w2bd_ref[:, :], b2b_ref[pl.ds(0, 1), :], in_hi, parity)
        if parity:
            lsep = jnp.log(_seg_sum(jnp.exp(p), in_hi))  # p in [0,1]
            pick = _seg_sum(p * onehot, in_hi)
        else:
            lsep = jnp.log(seg) + m
            pick = _seg_sum(z * onehot, in_hi)
        nll_l = lsep - pick                        # group-replicated

        is_max = (z == m).astype(jnp.float32)
        pickmax = _seg_sum(is_max * onehot, in_hi)
        earlier = _seg_sum(is_max * (cls < tgt_cls).astype(jnp.float32),
                           in_hi)
        match_l = pickmax * (earlier < 0.5).astype(jnp.float32)

        row = jax.lax.broadcasted_iota(jnp.int32, (tile2, 1), 0) \
            + ti * tile2
        pos = row * 2 + jnp.where(in_hi, 1, 0)
        valid = ((pos >= rf - 1) & (pos < t_total - 1)).astype(
            jnp.float32)
        acc_ref[0, 0] += jnp.sum(nll_l * valid) * (1.0 / 64.0)
        acc_ref[0, 1] += jnp.sum(match_l * valid) * (1.0 / 64.0)

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 ti == n_tiles - 1))
        def _():
            loss_ref[0, 0] = acc_ref[0, 0]
            match_ref[0, 0] = acc_ref[0, 1]

    return kernel


def _bwd_kernel_packed(rf: int, t_total: int, parity: bool, tile2: int,
                       n_tiles: int, n_batch: int, in_dtype):
    def kernel(skip2_ref, tgt2_ref, w1bd_ref, b1b_ref, w2bd_ref,
               b2b_ref, w1bdt_ref, w2bdt_ref, dloss_ref,
               dskip2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
               dw1_acc, db1_acc, dw2_acc, db2_acc):
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)

        @pl.when(jnp.logical_and(b_idx == 0, ti == 0))
        def _():
            dw1_acc[:, :] = jnp.zeros(dw1_acc.shape, jnp.float32)
            db1_acc[:, :] = jnp.zeros(db1_acc.shape, jnp.float32)
            dw2_acc[:, :] = jnp.zeros(dw2_acc.shape, jnp.float32)
            db2_acc[:, :] = jnp.zeros(db2_acc.shape, jnp.float32)

        sk = skip2_ref[0].astype(jnp.float32)
        onehot, tgt_cls, cls, in_hi = _packed_meta(
            tile2, n_batch, b_idx, tgt2_ref[:, :])
        y, z, m, e, seg, p = _packed_core(
            sk, w1bd_ref[:, :], b1b_ref[pl.ds(0, 1), :],
            w2bd_ref[:, :], b2b_ref[pl.ds(0, 1), :], in_hi, parity)

        row = jax.lax.broadcasted_iota(jnp.int32, (tile2, 1), 0) \
            + ti * tile2
        pos = row * 2 + jnp.where(in_hi, 1, 0)
        valid = ((pos >= rf - 1) & (pos < t_total - 1)).astype(
            jnp.float32)
        scale = dloss_ref[0] * valid

        if parity:
            ep = jnp.exp(p)              # p in [0,1]: no stabilizer
            q = ep / _seg_sum(ep, in_hi)
            g = q - onehot
            dz = (p * g - p * _seg_sum(p * g, in_hi)) * scale
        else:
            dz = (e / seg - onehot) * scale

        ly = _leaky(y)
        wo2 = _dot_t0(ly, dz)                          # (128, 128)
        dw2_acc[:, :] += wo2[:64, :64] + wo2[64:, 64:]
        db2s = jnp.sum(dz, axis=0, keepdims=True)      # (1, 128)
        db2_acc[:, :] += db2s[:, :64] + db2s[:, 64:]
        dy = _dot(dz, w2bdt_ref[:, :]) * _dleaky(y)
        lskip = _leaky(sk)
        wo1 = _dot_t0(lskip, dy)
        dw1_acc[:, :] += wo1[:64, :64] + wo1[64:, 64:]
        db1s = jnp.sum(dy, axis=0, keepdims=True)
        db1_acc[:, :] += db1s[:, :64] + db1s[:, 64:]
        dskip2_ref[0] = (_dot(dy, w1bdt_ref[:, :])
                         * _dleaky(sk)).astype(in_dtype)

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 ti == n_tiles - 1))
        def _():
            dw1_ref[:, :] = dw1_acc[:, :]
            db1_ref[:, :] = db1_acc[:, :]
            dw2_ref[:, :] = dw2_acc[:, :]
            db2_ref[:, :] = db2_acc[:, :]

    return kernel


def _fwd_kernel(rf: int, t_total: int, c: int, parity: bool, tile: int,
                n_tiles: int, n_batch: int, tgt_off: int = 0,
                save_p: bool = True, op_dt=jnp.float32):
    def kernel(skip_ref, tgt_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               loss_ref, match_ref, *rest):
        psave_ref = rest[0] if save_p else None
        acc_ref = rest[-1]
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)
        t0 = ti * tile

        @pl.when(jnp.logical_and(b_idx == 0, ti == 0))
        def _():
            acc_ref[0, 0] = 0.0
            acc_ref[0, 1] = 0.0

        skip = skip_ref[0].astype(jnp.float32)
        # select this batch's column from the (tile, >=n_batch) block
        # (tgt_off skips leading columns when targets ride a packed
        # codes array)
        lane = jax.lax.broadcasted_iota(jnp.int32, tgt_ref.shape, 1)
        tgt_col = jnp.sum(
            jnp.where(lane == tgt_off + b_idx,
                      tgt_ref[:, :].astype(jnp.int32), 0),
            axis=1, keepdims=True)                      # (tile, 1)
        _, z, p, onehot, zmax = _core(
            skip, tgt_col, w1_ref[:, :], b1_ref[pl.ds(0, 1), :],
            w2_ref[:, :], b2_ref[pl.ds(0, 1), :], c, parity, op_dt)
        nll = _nll_rows(z, p, onehot, parity, zmax)
        match = _match_rows(z, tgt_col, zmax)
        if save_p:
            # save softmax(z) f32 (EXACT — no rounding of probability
            # algebra) so the backward skips the z matmul, row max, and
            # softmax exp entirely; dz needs only this and (parity) one
            # exp over it
            if p is None:
                p = jnp.exp(z - zmax)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
            psave_ref[0] = p

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


def _bwd_kernel(rf: int, t_total: int, c: int, parity: bool, tile: int,
                n_tiles: int, n_batch: int, in_dtype, tgt_off: int = 0):
    def kernel(skip_ref, tgt_ref, psave_ref, w1_ref, b1_ref, w2_ref,
               b2_ref, w1t_ref, w2t_ref, dloss_ref,
               dskip_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
               dw1_acc, db1_acc, dw2_acc, db2_acc):
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)
        t0 = ti * tile

        @pl.when(jnp.logical_and(b_idx == 0, ti == 0))
        def _():
            dw1_acc[:, :] = jnp.zeros(dw1_acc.shape, jnp.float32)
            db1_acc[:, :] = jnp.zeros(db1_acc.shape, jnp.float32)
            dw2_acc[:, :] = jnp.zeros(dw2_acc.shape, jnp.float32)
            db2_acc[:, :] = jnp.zeros(db2_acc.shape, jnp.float32)

        skip = skip_ref[0].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, tgt_ref.shape, 1)
        tgt_col = jnp.sum(
            jnp.where(lane == tgt_off + b_idx,
                      tgt_ref[:, :].astype(jnp.int32), 0),
            axis=1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, c), 1)
        onehot = (col == tgt_col).astype(jnp.float32)
        # softmax(z) comes from the forward's f32 save: only the first
        # head matmul (for the leaky masks) is recomputed — no z
        # matmul, no row max, no softmax exp
        p = psave_ref[0]
        y = _mdot(_leaky(skip), w1_ref[:, :], in_dtype) \
            + b1_ref[pl.ds(0, 1), :]

        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t0
        valid = ((row >= rf - 1) & (row < t_total - 1)).astype(
            jnp.float32)
        scale = dloss_ref[0] * valid                    # (tile, 1)

        if parity:
            ep = jnp.exp(p)              # p in [0,1]: no stabilizer
            q = ep / jnp.sum(ep, axis=-1, keepdims=True)
            g = q - onehot
            dz = p * g - p * jnp.sum(p * g, axis=-1, keepdims=True)
        else:
            dz = p - onehot
        dz = dz * scale                                 # (tile, C)

        ly = _leaky(y)
        dw2_acc[:, :] += _mdot_t0(ly, dz, in_dtype)
        db2_acc[:, :] += jnp.sum(dz, axis=0, keepdims=True)
        dy = _mdot(dz, w2t_ref[:, :], in_dtype) * _dleaky(y)
        lskip = _leaky(skip)
        dw1_acc[:, :] += _mdot_t0(lskip, dy, in_dtype)
        db1_acc[:, :] += jnp.sum(dy, axis=0, keepdims=True)
        dskip_ref[0] = (_mdot(dy, w1t_ref[:, :], in_dtype)
                        * _dleaky(skip)).astype(in_dtype)

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 ti == n_tiles - 1))
        def _():
            dw1_ref[:, :] = dw1_acc[:, :]
            db1_ref[:, :] = db1_acc[:, :]
            dw2_ref[:, :] = dw2_acc[:, :]
            db2_ref[:, :] = db2_acc[:, :]

    return kernel


# Default OFF (measured on v5e, breakdancing config): with the
# correctness-required exact VPU segment sums the packed path is
# ~0.4 ms/step SLOWER than the unpacked kernels (13.4 vs 12.9 ms) —
# the dense-lane elementwise win is outweighed by the added
# reduce+select segment ops.  The earlier apparent -0.55 ms win came
# entirely from block-diagonal MXU segment sums whose default-precision
# rounding systematically biased the softmax gradients (a sine-overfit
# run visibly diverged).  Kept equivalence-tested for configs/hardware
# where the balance may differ.
PACKED_HEAD = False


def _use_packed(t_total: int, s: int, c: int) -> bool:
    if not PACKED_HEAD:
        return False
    if not (s == 64 and c == 64 and t_total % 2 == 0):
        return False
    try:
        _pick_tile(t_total // 2, 1, cap=2000)
    except ValueError:
        return False
    return True


def _fwd_pallas_packed(skip_sum, targets_tb, w1, b1, w2, b2, rf: int,
                       parity: bool, interpret: bool):
    batch, t_total, s = skip_sum.shape
    t2 = t_total // 2
    tile2 = _pick_tile(t2, 1, cap=2000)
    n_tiles = t2 // tile2
    skip2 = skip_sum.reshape(batch, t2, 128)
    tgt2 = targets_tb.reshape(t2, 2 * batch)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    loss, match = pl.pallas_call(
        _fwd_kernel_packed(rf, t_total, parity, tile2, n_tiles, batch),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile2, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile2, 2 * batch), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            vm, vm, vm, vm,
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(skip2, tgt2, _bd(w1), jnp.tile(b1.reshape(1, -1), (1, 2)),
      _bd(w2), jnp.tile(b2.reshape(1, -1), (1, 2)))
    return loss[0, 0], match[0, 0]


def _bwd_pallas_packed(skip_sum, targets_tb, w1, b1, w2, b2, rf,
                       parity, dloss, interpret):
    batch, t_total, s = skip_sum.shape
    t2 = t_total // 2
    tile2 = _pick_tile(t2, 1, cap=2000)
    n_tiles = t2 // tile2
    skip2 = skip_sum.reshape(batch, t2, 128)
    tgt2 = targets_tb.reshape(t2, 2 * batch)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    dskip2, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel_packed(rf, t_total, parity, tile2, n_tiles, batch,
                           skip_sum.dtype),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile2, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile2, 2 * batch), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            vm, vm, vm, vm, vm, vm,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile2, 128), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            vm, vm, vm, vm,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t2, 128), skip_sum.dtype),
            jax.ShapeDtypeStruct((64, 64), jnp.float32),
            jax.ShapeDtypeStruct((1, 64), jnp.float32),
            jax.ShapeDtypeStruct((64, 64), jnp.float32),
            jax.ShapeDtypeStruct((1, 64), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((64, 64), jnp.float32),
            pltpu.VMEM((1, 64), jnp.float32),
            pltpu.VMEM((64, 64), jnp.float32),
            pltpu.VMEM((1, 64), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(skip2, tgt2, _bd(w1), jnp.tile(b1.reshape(1, -1), (1, 2)),
      _bd(w2), jnp.tile(b2.reshape(1, -1), (1, 2)),
      _bd(jnp.swapaxes(w1, 0, 1)), _bd(jnp.swapaxes(w2, 0, 1)),
      jnp.asarray([dloss], jnp.float32))
    dskip = dskip2.reshape(batch, t_total, 64)
    return dskip, dw1, db1.reshape(-1), dw2, db2.reshape(-1)


def _fwd_pallas(skip_sum, targets_tb, w1, b1, w2, b2, rf: int,
                parity: bool, interpret: bool, tgt_off: int = 0,
                save_p: bool = True):
    """``save_p=False`` (the primal / eval call) skips the (B, T, C)
    f32 softmax save entirely — it is only consumed by the VJP backward,
    and materializing it costs a pure ~B*T*C*4-byte HBM write."""
    batch, t_total, s = skip_sum.shape
    c = w2.shape[1]
    if tgt_off == 0 and targets_tb.shape[1] == batch and \
            _use_packed(t_total, s, c):
        loss, match = _fwd_pallas_packed(skip_sum, targets_tb, w1, b1,
                                         w2, b2, rf, parity, interpret)
        return loss, match, None
    tile = _pick_tile(t_total, 1, cap=8000)  # fwd holds few live tensors
    n_tiles = t_total // tile

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_specs = [sm, sm]
    out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32),
                 jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    if save_p:
        out_specs.append(pl.BlockSpec((1, tile, c),
                                      lambda b, i: (b, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((batch, t_total, c), jnp.float32))
    out = pl.pallas_call(
        _fwd_kernel(rf, t_total, c, parity, tile, n_tiles, batch,
                    tgt_off, save_p, op_dt=skip_sum.dtype),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, targets_tb.shape[1]),
                         lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            vm, vm, vm, vm,
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(skip_sum, targets_tb, w1, b1.reshape(1, -1), w2,
      b2.reshape(1, -1))
    loss, match = out[0], out[1]
    psave = out[2] if save_p else None
    return loss[0, 0], match[0, 0], psave


def _bwd_pallas(skip_sum, targets_tb, psave, w1, b1, w2, b2, rf,
                parity, dloss, interpret, tgt_off: int = 0):
    batch, t_total, s = skip_sum.shape
    c = w2.shape[1]
    if tgt_off == 0 and targets_tb.shape[1] == batch and \
            _use_packed(t_total, s, c):
        return _bwd_pallas_packed(skip_sum, targets_tb, w1, b1, w2, b2,
                                  rf, parity, dloss, interpret)
    tile = _pick_tile(t_total, 1, cap=8000)
    n_tiles = t_total // tile
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    dskip, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel(rf, t_total, c, parity, tile, n_tiles, batch,
                    skip_sum.dtype, tgt_off),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, targets_tb.shape[1]),
                         lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            vm, vm, vm, vm, vm, vm,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            vm, vm, vm, vm,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_total, s), skip_sum.dtype),
            jax.ShapeDtypeStruct((s, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((s, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(skip_sum, targets_tb, psave, w1, b1.reshape(1, -1), w2,
      b2.reshape(1, -1), jnp.swapaxes(w1, 0, 1), jnp.swapaxes(w2, 0, 1),
      jnp.asarray([dloss], jnp.float32))
    return dskip, dw1, db1.reshape(-1), dw2, db2.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_head_loss(skip_sum, targets_tb, w1, b1, w2, b2,
                    rf: int, parity: bool, interpret: bool = False,
                    tgt_off: int = 0):
    """(loss_sum, match_count) over the valid region [RF-1, T-1).

    Args:
      skip_sum: (B, T, S) accumulated skip connections (full length).
      targets_tb: (T, >=B) int32 where row t of column tgt_off + b
        holds codes[b, t+1] (last row is junk and masked).  tgt_off
        lets the targets ride a packed codes array (models/fused.py)
        so the s32 relayout happens once.
      w1/b1, w2/b2: head parameters (S,C)/(C,), (C,C)/(C,).
    """
    loss, match, _ = _fwd_pallas(skip_sum, targets_tb, w1, b1, w2,
                                 b2, rf, parity, interpret, tgt_off,
                                 save_p=False)
    return loss, match


def _fhl_fwd(skip_sum, targets_tb, w1, b1, w2, b2, rf, parity,
             interpret, tgt_off):
    loss, match, psave = _fwd_pallas(skip_sum, targets_tb, w1, b1, w2,
                                     b2, rf, parity, interpret,
                                     tgt_off)
    return (loss, match), (skip_sum, targets_tb, psave, w1, b1, w2, b2)


def _fhl_bwd(rf, parity, interpret, tgt_off, saved, grads):
    skip_sum, targets_tb, psave, w1, b1, w2, b2 = saved
    dloss, _ = grads  # match count is not differentiated
    dskip, dw1, db1, dw2, db2 = _bwd_pallas(
        skip_sum, targets_tb, psave, w1, b1, w2, b2, rf, parity, dloss,
        interpret, tgt_off)
    return (dskip, None, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_head_loss.defvjp(_fhl_fwd, _fhl_bwd)
