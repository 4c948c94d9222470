"""Fused-kernel training forward: the WaveNet trunk as a chain of
Pallas fused gated blocks (ops/pallas/gated_block).

Works directly over the flax parameter pytree (like the samplers do),
so the flax module stays the single owner of parameters and checkpoints
are unchanged; gradients flow into the same tree through the kernels'
custom VJPs.

Used by the train/eval loss when ``TrainingConfig.fused_blocks`` is set
and the sequence length is a multiple of the kernel tile (128) — which
all canonical configs are (160k, and the power-of-ten crops).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from movenet_tpu.models.wavenet import WaveNet
from movenet_tpu.ops.pallas.gated_block import TILE, fused_gated_block


def supports_fused(model: WaveNet, time_steps: int) -> bool:
    return time_steps % TILE == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _front_embed(cur_table, past_table, codes, dt, vocab):
    """Front causal conv as an embedding lookup:
    h[t] = cur[codes[t]] + past[codes[t-1]] (zero at t=0).

    Both directions are one-hot MXU matmuls: TPU row gathers of 320k
    indices from a tiny (V, R) table cost ~1 ms on v5e (measured,
    scripts/probe_encoders.py) where the equivalent one-hot matmul is
    ~3x faster — one-hot rows select exactly one table entry, so the
    result is bit-identical to the gather.  The default gather VJP
    would be worse still (a 320k-row scatter-add).
    """
    oh = jax.nn.one_hot(codes, vocab, dtype=dt)
    table = jnp.concatenate([cur_table, past_table],
                            axis=1).astype(dt)           # (V, 2R)
    both = jnp.dot(oh, table, preferred_element_type=dt)  # (B, T, 2R)
    r = cur_table.shape[1]
    cur, prev = both[..., :r], both[..., r:]
    return cur + jnp.pad(prev, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]


def _fe_fwd(cur_table, past_table, codes, dt, vocab):
    out = _front_embed(cur_table, past_table, codes, dt, vocab)
    return out, codes


def _fe_bwd(dt, vocab, saved, dh):
    codes = saved
    table_dtype = jnp.float32  # parameters are always stored f32
    r = dh.shape[-1]
    onehot = jax.nn.one_hot(codes.reshape(-1), vocab, dtype=dt)
    dcur = jax.lax.dot_general(
        onehot, dh.reshape(-1, r).astype(dt),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # past[codes[t]] feeds h[t+1]: pair codes[:, :-1] with dh[:, 1:]
    onehot_p = jax.nn.one_hot(codes[:, :-1].reshape(-1), vocab, dtype=dt)
    dpast = jax.lax.dot_general(
        onehot_p, dh[:, 1:, :].reshape(-1, r).astype(dt),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return dcur.astype(table_dtype), dpast.astype(table_dtype), None


_front_embed.defvjp(_fe_fwd, _fe_bwd)


def _ctx_proj_tile_ok(model: WaveNet, t: int) -> bool:
    """The in-kernel projection backward splits its dctx tile into
    per-phase columns: the (tile/10, R) coarse blocks need tile % 80
    (integral rows AND Mosaic's %8 second-to-last-dim rule — tile=1000
    failed lowering on-chip 2026-08-19).  pick_stack_tile(ctx=True)
    prefers such tiles but falls back when none divides T; re-check
    %80 here so the projection stays out of the kernel on fallback."""
    from movenet_tpu.ops.pallas.stack_kernel import pick_stack_tile

    try:
        tile = pick_stack_tile(t, tuple(model.dilations), ctx=True)
    except ValueError:
        return False
    return tile % 80 == 0


def _prepare_trunk(model: WaveNet, params, codes, video, labels,
                   want_h: bool = True):
    """Shared prologue: encoders + front embedding + per-layer packed
    weights; returns (h, ctx, block_weights).  ``want_h=False`` skips
    the front embedding (h is None) — used by the embed-folded
    whole-stack kernel, which computes it per tile in VMEM."""
    b, t = codes.shape
    if t % TILE:
        raise ValueError(
            f"fused path needs T % {TILE} == 0, got {t}; use the "
            "unfused WaveNet.train_logits")
    r = model.residual_channels
    dt = jnp.bfloat16 if model.compute_dtype == jnp.bfloat16 \
        else jnp.float32
    variables = {"params": params}

    ctx = None
    if video is not None:
        # prefer the coarse (B, T/10, R) features + projection triple:
        # the final stride-10 upsample then runs inside the fused
        # kernels' VJP (ctx_proj in ops/pallas/stack_kernel) instead of
        # paying the (T/10, 10R) -> (T, R) repack, its transpose, and
        # the bias-grad batch reduce in XLA (~0.29 ms/step measured on
        # the breakdancing config)
        from movenet_tpu.models.wavenet import video_upsample_sizes

        up_name = None
        if t % 10 == 0 and _ctx_proj_tile_ok(model, t):
            sizes = video_upsample_sizes(model.max_video_frames,
                                         model.max_audio_frames)
            up_name = f"upsample_{len(sizes) - 2}"
        ve_params = params.get("video_encoder", {})
        if up_name is not None and up_name in ve_params:
            xc = model.apply(variables, video,
                             method=WaveNet.encode_video_coarse)
            if xc.shape[1] * 10 == t:
                ctx = (xc.astype(dt), ve_params[up_name]["kernel"],
                       ve_params[up_name]["bias"])
            elif xc.shape[1] == t:   # coarse fell back to full rate
                ctx = xc.astype(dt)
        if ctx is None:
            ctx = model.apply(variables, video,
                              method=WaveNet.encode_video)
            if ctx.shape[1] != t:
                raise ValueError(
                    "expected upsampled video and audio to have equal "
                    f"time lengths, found {ctx.shape[1]}, {t}")
            ctx = ctx.astype(dt)
    global_vec = None
    if labels is not None and model.global_classes:
        global_vec = model.apply(variables, labels,
                                 method=WaveNet.embed_global)
        global_vec = global_vec.astype(jnp.float32)

    # front causal conv as an embedding lookup (one-hot matmul)
    h = None
    if want_h:
        h = _front_embed(params["front_cur"], params["front_past"],
                         codes, dt, params["front_cur"].shape[0])

    # stacked trunk weights, straight from the stacked param layout
    # (wavenet.py setup): one concat per tensor class, no per-layer
    # packing loop
    def f32(x):
        return x.astype(jnp.float32)

    fg_parts = [f32(params["blocks_w_cur"]), f32(params["blocks_w_past"])]
    n_layers = fg_parts[0].shape[0]
    b_fg_all = jnp.zeros((n_layers, b, 2 * r), jnp.float32)
    if ctx is not None:
        fg_parts.append(f32(params["blocks_ctx_kernel"]))
        b_fg_all = b_fg_all + f32(params["blocks_ctx_bias"])[:, None, :]
    if global_vec is not None:
        b_fg_all = b_fg_all + jnp.einsum(
            "br,lro->lbo", global_vec,
            f32(params["blocks_global_kernel"]),
            precision=jax.lax.Precision.HIGHEST)
    w_fg_all = jnp.concatenate(fg_parts, axis=1)      # (L, 2R|3R, 2R)
    w_out_all = jnp.concatenate(
        [f32(params["blocks_res_kernel"]),
         f32(params["blocks_skip_kernel"])], axis=2)  # (L, R, R+S)
    b_out_all = jnp.concatenate(
        [f32(params["blocks_res_bias"]),
         f32(params["blocks_skip_bias"])], axis=1)    # (L, R+S)
    stacked = (b_fg_all, w_fg_all, w_out_all, b_out_all)

    def block_weights(i):  # per-layer slices (per-block fallback path)
        return (b_fg_all[i], w_fg_all[i], w_out_all[i], b_out_all[i])

    return h, ctx, stacked, block_weights


def _codes_pack(codes, with_targets: bool, vocab: int = 256):
    """ONE (T, kB) int16 relayout serving every per-position consumer:
    columns [0,B) = codes, [B,2B) = codes shifted right (row 0 = -1
    sentinel), and with_targets, [2B,3B) = codes shifted left (CE
    targets; junk last row, masked by the head kernel).  The shifts
    happen on the compact (B, T) layout — row ops on the padded (T, B)
    tiling rewrite every 128-lane tile and cost ~0.5 ms/step; separate
    transposes per consumer cost ~0.13 ms each (both measured, v5e).
    int16 halves the lane-padded (T, 128) relayout write (~0.06 ms);
    kernels widen to s32 at load.  int16 requires vocab < 32768 (mu-law
    quantization_channels is <= 256 everywhere in the reference,
    config.py:149-240) — a wider vocab falls back to int32 instead of
    silently wrapping code values (the shape/dtype are static, so the
    check is free under jit)."""
    b = codes.shape[0]
    pack_dt = jnp.int16 if vocab < 2 ** 15 else jnp.int32
    c16 = codes.astype(pack_dt)
    parts = [c16,
             jnp.concatenate([jnp.full((b, 1), -1, pack_dt),
                              c16[:, :-1]], axis=1)]
    if with_targets:
        parts.append(jnp.roll(c16, -1, axis=1))
    return jnp.concatenate(parts, axis=0).T              # (T, kB)


def _fused_trunk(model: WaveNet, params, codes, video, labels,
                 interpret: bool, codes_pack=None):
    """Shared fused trunk: codes (+video/labels) -> skip_sum (B,T,S)."""
    b, t = codes.shape
    r = model.residual_channels
    vocab = params["front_cur"].shape[0]
    dt = jnp.bfloat16 if model.compute_dtype == jnp.bfloat16 \
        else jnp.float32
    h, ctx, stacked_w, block_weights = _prepare_trunk(
        model, params, codes, video, labels, want_h=False)
    dilations = tuple(model.dilations)
    stacked = _stack_weights(model, stacked_w, t, dilations)
    if stacked is not None:
        from movenet_tpu.ops.pallas.stack_kernel import (
            fused_stack, fused_stack_embed, resolve_strategy)

        strategy, b_fg_all, w_fg_all, w_out_all, b_out_all = stacked
        mode = resolve_strategy(strategy, (b, t, r), len(dilations),
                                dilations, jnp.dtype(dt).itemsize)
        if mode == "save" and 2 * vocab <= 512:
            # front embedding folded into the kernel: no h / one-hot /
            # dx round-trips through HBM (~0.5 ms/step saved)
            if codes_pack is None:
                codes_pack = _codes_pack(codes, with_targets=False,
                                         vocab=vocab)
            table2 = jnp.concatenate(
                [params["front_cur"], params["front_past"]],
                axis=0).astype(dt)
            return fused_stack_embed(
                codes_pack, table2, ctx, b_fg_all, w_fg_all,
                w_out_all, b_out_all, dilations, dt, interpret)
        h = _front_embed(params["front_cur"], params["front_past"],
                         codes, dt, vocab)
        return fused_stack(h, ctx, b_fg_all, w_fg_all, w_out_all,
                           b_out_all, dilations, interpret, strategy)

    h = _front_embed(params["front_cur"], params["front_past"], codes,
                     dt, vocab)
    if ctx is not None:
        from movenet_tpu.ops.pallas.stack_kernel import (
            ctx_flatten, ctx_is_proj)

        if ctx_is_proj(ctx):   # per-block fallback runs on flat ctx
            ctx = ctx_flatten(ctx, dt)
    skip_sum = None
    for i, d in enumerate(dilations):
        b_fg, w_fg, w_out, b_out = block_weights(i)
        h, skip = fused_gated_block(h, ctx, b_fg, w_fg, w_out,
                                    b_out.reshape(1, -1), d, interpret)
        skip_sum = skip if skip_sum is None else skip_sum + skip
    return skip_sum


def _stack_weights(model, stacked_w, t, dilations):
    """Kernel-ready stacked weights + VJP strategy for the whole-stack
    kernel, or None when no common tile exists (per-block fallback)."""
    from movenet_tpu.ops.pallas.stack_kernel import (
        pick_stack_tile, supports_recompute)

    try:
        pick_stack_tile(t, dilations)
    except ValueError:
        return None
    # explicit override first; else remat asks for the O(sum d)
    # tails-recompute VJP when possible
    strategy = getattr(model, "fused_strategy", None)
    if strategy is None:
        strategy = "recompute" if (
            model.remat and supports_recompute(t, dilations)) else "auto"
    b_fg_all, w_fg_all, w_out_all, b_out_all = stacked_w
    return (strategy, b_fg_all.reshape(-1, b_fg_all.shape[-1]),
            w_fg_all, w_out_all, b_out_all)


def _merged_loss(model: WaveNet, params, codes, video, labels,
                 parity: bool, interpret: bool):
    """(loss_sum, match) through the fully-merged trunk+head kernel, or
    None when the whole-stack kernel or save-all strategy don't apply."""
    from movenet_tpu.ops.pallas.stack_kernel import (
        fused_stack_head_loss, resolve_strategy)

    b, t = codes.shape
    dilations = tuple(model.dilations)
    h, ctx, stacked_w, _ = _prepare_trunk(model, params, codes, video,
                                          labels)
    if ctx is not None:
        from movenet_tpu.ops.pallas.stack_kernel import (
            ctx_flatten, ctx_is_proj)

        if ctx_is_proj(ctx):   # merged trunk+head runs on flat ctx
            ctx = ctx_flatten(ctx, h.dtype)
    stacked = _stack_weights(model, stacked_w, t, dilations)
    if stacked is None:
        return None
    strategy, b_fg_all, w_fg_all, w_out_all, b_out_all = stacked
    if resolve_strategy(strategy, h.shape, len(dilations), dilations,
                        h.dtype.itemsize) != "save":
        return None
    targets_tb = jnp.roll(codes, -1, axis=1).T           # (T, B)
    return fused_stack_head_loss(
        h, ctx, b_fg_all, w_fg_all, w_out_all, b_out_all, targets_tb,
        params["head1"]["kernel"], params["head1"]["bias"],
        params["head2"]["kernel"], params["head2"]["bias"],
        dilations, model.receptive_fields, parity, interpret)


def codes_pack_np(codes) -> "np.ndarray":
    """Host-side (numpy) twin of _codes_pack: (B, T) int -> (T, 3B)
    int32.  Computed in dataloader workers so the device never pays the
    relayout write; same values as the in-device pack
    (tests/test_fused_model.py).  Stays int32 — an int16 jit INPUT
    arrives in the T(16,128) parameter tiling and XLA inserts a full
    relayout copy to Mosaic's T(8,128)(2,1) operand tiling (measured:
    the copy costs exactly what the pack op did); int32 parameter and
    operand tilings agree, so the array streams straight into the
    kernel."""
    import numpy as np

    b = codes.shape[0]
    c = np.asarray(codes, np.int32)
    prev = np.concatenate(
        [np.full((b, 1), -1, np.int32), c[:, :-1]], axis=1)
    tgt = np.roll(c, -1, axis=1)
    return np.ascontiguousarray(
        np.concatenate([c, prev, tgt], axis=0).T)


def fused_train_loss(model: WaveNet, params, codes: jnp.ndarray,
                     video=None, labels=None, parity: bool = True,
                     interpret: bool = False,
                     merge_head: bool = False, codes_pack=None):
    """codes -> (mean NLL, accuracy), fully kernelized: fused trunk +
    fused head/CE (logits never materialize in HBM).

    ``merge_head=True`` additionally fuses the head + CE INTO the trunk
    kernels (fused_stack_head_loss) so dskip never round-trips through
    HBM.  Measured on v5e this is ~5% SLOWER than the split pipeline on
    the breakdancing config (the head work serializes into every trunk
    grid step and the saved DMA was already hidden under compute), so
    the split pipeline is the default; the merged op stays available
    and equivalence-tested for configs where the balance differs.
    """
    from movenet_tpu.ops.pallas.head_loss import fused_head_loss

    b, t = codes.shape
    skip_sum = None
    if merge_head and supports_fused(model, t):
        merged = _merged_loss(model, params, codes, video, labels,
                              parity, interpret)
        if merged is not None:
            loss_sum, match = merged
            n_valid = b * (t - model.receptive_fields)
            return loss_sum / n_valid, match / n_valid
    # one packed (T, 3B) relayout carries codes + prev + targets for
    # both the trunk and the head kernel; a host-precomputed pack
    # (codes_pack_np) skips the on-device relayout entirely
    if codes_pack is not None and \
            codes_pack.shape == (codes.shape[1], 3 * b):
        pack3 = codes_pack
    else:
        pack3 = _codes_pack(codes, with_targets=True,
                            vocab=model.input_channels)
    skip_sum = _fused_trunk(model, params, codes, video, labels,
                            interpret, codes_pack=pack3)
    loss_sum, match = fused_head_loss(
        skip_sum, pack3, params["head1"]["kernel"],
        params["head1"]["bias"], params["head2"]["kernel"],
        params["head2"]["bias"], model.receptive_fields, parity,
        interpret, tgt_off=2 * b)
    n_valid = b * (t - model.receptive_fields)
    return loss_sum / n_valid, match / n_valid


def fused_train_logits(model: WaveNet, params, codes: jnp.ndarray,
                       video: Optional[jnp.ndarray] = None,
                       labels: Optional[jnp.ndarray] = None,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, T) codes -> (B, T-RF, C) logits, Pallas-fused trunk.

    Same mathematics as ``WaveNet.train_logits``; the trunk runs through
    the fused kernels (whole-stack when a common tile exists).  Prefer
    ``fused_train_loss`` in training — it also fuses the head and CE so
    the logits never materialize.
    """
    b, t = codes.shape
    skip_sum = _fused_trunk(model, params, codes, video, labels,
                            interpret)
    y = jax.nn.leaky_relu(skip_sum.astype(jnp.float32))
    y = jnp.dot(y.reshape(-1, y.shape[-1]), params["head1"]["kernel"],
                precision=jax.lax.Precision.HIGHEST) \
        + params["head1"]["bias"]
    logits = jnp.dot(jax.nn.leaky_relu(y), params["head2"]["kernel"],
                     precision=jax.lax.Precision.HIGHEST) \
        + params["head2"]["bias"]
    logits = logits.reshape(b, t, -1)
    return logits[:, model.receptive_fields - 1:-1, :]
