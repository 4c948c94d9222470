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
  backward: recomputes y/z/p per tile (remat), applies the analytic
            dL/dz (parity: p (.) g - p * (p.g), g = softmax(p) - onehot;
            clean: softmax(z) - onehot), backprops the two matmuls, and
            accumulates the head weight/bias grads in f32 VMEM scratch.

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

from movenet_tpu.ops.pallas.gated_block import _dot, _dot_t0, _pick_tile


def _leaky(x):
    return jnp.where(x > 0, x, 0.01 * x)


def _dleaky(x):
    return jnp.where(x > 0, 1.0, 0.01)


def _core(skip, tgt_col, w1, b1, w2, b2, c: int, parity: bool):
    """Shared per-tile forward: (y_pre, z, p_or_none, onehot, zmax).

    The softmax is manual so its row max can be shared with
    _match_rows (jax.nn.softmax would compute its own)."""
    act = _leaky(skip)
    y = _dot(act, w1) + b1
    z = _dot(_leaky(y), w2) + b2                      # (tile, C)
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


def _fwd_kernel(rf: int, t_total: int, c: int, parity: bool, tile: int,
                n_tiles: int, n_batch: int):
    def kernel(skip_ref, tgt_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               loss_ref, match_ref, acc_ref):
        b_idx = pl.program_id(0)
        ti = pl.program_id(1)
        t0 = ti * tile

        @pl.when(jnp.logical_and(b_idx == 0, ti == 0))
        def _():
            acc_ref[0, 0] = 0.0
            acc_ref[0, 1] = 0.0

        skip = skip_ref[0].astype(jnp.float32)
        # select this batch's column from the (tile, n_batch) block
        lane = jax.lax.broadcasted_iota(jnp.int32, tgt_ref.shape, 1)
        tgt_col = jnp.sum(jnp.where(lane == b_idx, tgt_ref[:, :], 0),
                          axis=1, keepdims=True)        # (tile, 1)
        _, z, p, onehot, zmax = _core(
            skip, tgt_col, w1_ref[:, :], b1_ref[pl.ds(0, 1), :],
            w2_ref[:, :], b2_ref[pl.ds(0, 1), :], c, parity)
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


def _bwd_kernel(rf: int, t_total: int, c: int, parity: bool, tile: int,
                n_tiles: int, n_batch: int, in_dtype):
    def kernel(skip_ref, tgt_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               w1t_ref, w2t_ref, dloss_ref,
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
        tgt_col = jnp.sum(jnp.where(lane == b_idx, tgt_ref[:, :], 0),
                          axis=1, keepdims=True)
        y, z, p, onehot, _zmax = _core(
            skip, tgt_col, w1_ref[:, :], b1_ref[pl.ds(0, 1), :],
            w2_ref[:, :], b2_ref[pl.ds(0, 1), :], c, parity)

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
            dz = jax.nn.softmax(z, axis=-1) - onehot
        dz = dz * scale                                 # (tile, C)

        ly = _leaky(y)
        dw2_acc[:, :] += _dot_t0(ly, dz)
        db2_acc[:, :] += jnp.sum(dz, axis=0, keepdims=True)
        dy = _dot(dz, w2t_ref[:, :]) * _dleaky(y)       # (tile, C)
        lskip = _leaky(skip)
        dw1_acc[:, :] += _dot_t0(lskip, dy)
        db1_acc[:, :] += jnp.sum(dy, axis=0, keepdims=True)
        dskip_ref[0] = (_dot(dy, w1t_ref[:, :])
                        * _dleaky(skip)).astype(in_dtype)

        @pl.when(jnp.logical_and(b_idx == n_batch - 1,
                                 ti == n_tiles - 1))
        def _():
            dw1_ref[:, :] = dw1_acc[:, :]
            db1_ref[:, :] = db1_acc[:, :]
            dw2_ref[:, :] = dw2_acc[:, :]
            db2_ref[:, :] = db2_acc[:, :]

    return kernel


def _fwd_pallas(skip_sum, targets_tb, w1, b1, w2, b2, rf: int,
                parity: bool, interpret: bool):
    batch, t_total, s = skip_sum.shape
    c = w2.shape[1]
    tile = _pick_tile(t_total, 1, cap=4000)  # fwd holds few live tensors
    n_tiles = t_total // tile

    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    loss, match = pl.pallas_call(
        _fwd_kernel(rf, t_total, c, parity, tile, n_tiles, batch),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, batch), lambda b, i: (i, 0),
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
    )(skip_sum, targets_tb, w1, b1.reshape(1, -1), w2,
      b2.reshape(1, -1))
    return loss[0, 0], match[0, 0]


def _bwd_pallas(skip_sum, targets_tb, w1, b1, w2, b2, rf, parity,
                dloss, interpret):
    batch, t_total, s = skip_sum.shape
    c = w2.shape[1]
    tile = _pick_tile(t_total, 1, cap=2000)
    n_tiles = t_total // tile
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    dskip, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel(rf, t_total, c, parity, tile, n_tiles, batch,
                    skip_sum.dtype),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, s), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, batch), lambda b, i: (i, 0),
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
    )(skip_sum, targets_tb, w1, b1.reshape(1, -1), w2,
      b2.reshape(1, -1), jnp.swapaxes(w1, 0, 1), jnp.swapaxes(w2, 0, 1),
      jnp.asarray([dloss], jnp.float32))
    return dskip, dw1, db1.reshape(-1), dw2, db2.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_head_loss(skip_sum, targets_tb, w1, b1, w2, b2,
                    rf: int, parity: bool, interpret: bool = False):
    """(loss_sum, match_count) over the valid region [RF-1, T-1).

    Args:
      skip_sum: (B, T, S) accumulated skip connections (full length).
      targets_tb: (T, B) int32 where row t holds codes[t+1] (last row
        is junk and masked).
      w1/b1, w2/b2: head parameters (S,C)/(C,), (C,C)/(C,).
    """
    return _fwd_pallas(skip_sum, targets_tb, w1, b1, w2, b2, rf,
                       parity, interpret)


def _fhl_fwd(skip_sum, targets_tb, w1, b1, w2, b2, rf, parity,
             interpret):
    out = _fwd_pallas(skip_sum, targets_tb, w1, b1, w2, b2, rf, parity,
                      interpret)
    return out, (skip_sum, targets_tb, w1, b1, w2, b2)


def _fhl_bwd(rf, parity, interpret, saved, grads):
    skip_sum, targets_tb, w1, b1, w2, b2 = saved
    dloss, _ = grads  # match count is not differentiated
    dskip, dw1, db1, dw2, db2 = _bwd_pallas(
        skip_sum, targets_tb, w1, b1, w2, b2, rf, parity, dloss,
        interpret)
    return (dskip, None, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


fused_head_loss.defvjp(_fhl_fwd, _fhl_bwd)
