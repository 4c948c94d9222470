"""Single-kernel autoregressive WaveNet sampler (Pallas, TPU).

The lax.scan sampler (models/sampler.py) already removes the
reference's O(T*RF) recomputation, but each scan iteration still
re-reads every weight from HBM (~3.7 MB/step for the flagship config)
and pays XLA while-loop step overhead.  This kernel keeps ALL weights
and the per-layer dilation ring buffers resident in VMEM and runs the
entire generation loop inside one ``pallas_call``:

  * per step: front-embedding gather via a one-hot MXU matmul, L
    unrolled gated-residual blocks as (B,R)x(R,2R) VMEM matmuls,
    dilation ring buffers as dynamic row-slab slices of one packed
    (sum_dilations*B, R) scratch buffer, head matmuls, then greedy
    argmax or Gumbel-max sampling from a counter-based positional
    hash (stateless — speculation and the standard kernel share one
    stream; see _positional_gumbel);
  * batch lives in the sublane dimension (B in {1, 2, 4, 8}); prompt
    and output codes are lane-packed int32 tiles (128/B timesteps per
    row) with vectorized lane select/insert — no scalar memory traffic;
    the two (B,1)<->(1,B) pivots per step are tiny (B,B) dot_generals,
    not relayouts;
  * video conditioning: the upsampled context features stream from HBM
    through a double-buffered DMA ((CHUNK*B, R) slabs) and the per-layer
    context projection is FOLDED into the tap matmul —
    [h | past | ctx] (B,3R) @ (3R,2R) — so conditioning costs no extra
    matmul issue, only the context-conv biases as a per-layer fg bias;
  * weights are stacked per-layer (L, 2R|3R, 2R)/(L, R, R+S)/... so the
    kernel takes a handful of refs instead of 6*L.

Sampling matches models/sampler.py exactly for temperature=0 (greedy).
For temperature>0 a Gumbel-max draw replaces jax.random.categorical
(same distribution, different RNG stream): parity mode perturbs
softmax(logits)/T (the reference's double-softmax quirk,
wavenet.py:227-233), clean mode perturbs logits/T.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from movenet_tpu.models.wavenet import WaveNet

_LANES = 128
_CTX_CHUNK = 512  # timesteps of context per DMA slab

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_HI)


def _positional_gumbel(seed_i32, tt, batch: int, c_in: int):
    """(batch, c_in) Gumbel noise as a pure function of
    (seed, position tt, stream b, class c) — counter-based (lowbias32
    integer hash of the flat index), no PRNG state.

    Statelessness is the point (round 4): the standard kernel draws
    position t at iteration t, the speculative kernel draws positions
    t and t+1 in ONE iteration, and both get bit-identical noise, so
    sampled speculative decoding reproduces the standard kernel's
    stream exactly.  Plain vector uint32 xors/shifts/mults also lower
    identically under Mosaic and the interpreter (pltpu.prng_* has no
    CPU-interpret implementation).  lowbias32 easily clears the bar
    for audio sampling; this is not a cryptographic stream.

    Replaces the RNG behind the reference's torch.multinomial draw
    (/root/reference/movenet/wavenet.py:227-231); the parity
    softmax-then-divide score shaping is applied by the callers."""
    bi = jax.lax.broadcasted_iota(jnp.uint32, (batch, c_in), 0)
    ci = jax.lax.broadcasted_iota(jnp.uint32, (batch, c_in), 1)
    x = (tt.astype(jnp.uint32) * jnp.uint32(batch) + bi) \
        * jnp.uint32(c_in) + ci
    x = x ^ (seed_i32.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x21F0AAAD)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0xD35A2D97)
    x = x ^ (x >> 15)
    # top 24 bits -> [0,1): bitcast the shifted word to int32 (exact —
    # the high 8 bits are zero) because Mosaic has no uint32->f32
    # convert (NotImplementedError "Unsupported cast: uint32 ->
    # float32", observed on-chip 2026-08-19, v5e libtpu); int32->f32
    # lowers fine and is bit-identical here
    u24 = jax.lax.bitcast_convert_type(x >> 8, jnp.int32)
    u = u24.astype(jnp.float32) * (1.0 / (1 << 24))
    return -jnp.log(-jnp.log(u + 1e-20) + 1e-20)


def stack_sampler_params(model: WaveNet, variables,
                         with_context: bool = False) -> dict:
    """Stack per-layer params into dense arrays for the kernel.

    with_context=True builds (3R, 2R) tap matrices [cur; past; ctx] and
    a per-layer fg bias from the context-conv biases; otherwise (2R, 2R)
    taps and zero fg bias.
    """
    p = variables["params"] if "params" in variables else variables
    r = model.residual_channels
    n_layers = len(model.dilations)

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    fg_parts = [f32(p["blocks_w_cur"]), f32(p["blocks_w_past"])]
    if with_context:
        fg_parts.append(f32(p["blocks_ctx_kernel"]))
        b_fg = f32(p["blocks_ctx_bias"])
    else:
        b_fg = jnp.zeros((n_layers, 2 * r), jnp.float32)

    return {
        "front_cur": f32(p["front_cur"]),
        "front_past": f32(p["front_past"]),
        "w_fg": jnp.concatenate(fg_parts, axis=1),
        "b_fg": b_fg,
        "w_out": jnp.concatenate(
            [f32(p["blocks_res_kernel"]),
             f32(p["blocks_skip_kernel"])], axis=2),
        "b_out": jnp.concatenate(
            [f32(p["blocks_res_bias"]),
             f32(p["blocks_skip_bias"])], axis=1),
        "h1_w": f32(p["head1"]["kernel"]),
        "h1_b": f32(p["head1"]["bias"]).reshape(1, -1),
        "h2_w": f32(p["head2"]["kernel"]),
        "h2_b": f32(p["head2"]["bias"]).reshape(1, -1),
    }


def stack_fast_weights(model: WaveNet, sp: dict) -> dict:
    """Precomputed weight products for the short-critical-path sampler.

    Reassociation (NOTES_ROUND2 item 3a): with
    h_{l+1} = gated_l @ W_res_l + b_res_l + h_l,
    fg_{l+1} = [h_{l+1} | past_{l+1} | ctx] @ W_fg_{l+1} + b_{l+1}
             = gated_l @ (W_res_l W_cur_{l+1})                (dependent)
             + [h_l | past_{l+1} | ctx] @ W_fg_{l+1}
             + b_{l+1} + b_res_l @ W_cur_{l+1}              (independent)
    so only ONE matmul per layer sits on the sample's dependency chain;
    the independent part issues concurrently and its latency hides.

    The front embedding folds the same way: with
    h_0 = onehot_cur @ E_cur + onehot_prev @ E_past,
    fg_0 = onehot_cur @ (E_cur W_cur_0)          (the only dependent op)
         + onehot_prev @ (E_past W_cur_0) + [past_0 | ctx] @ rest + b_0.

    Packed-tanh gating rescaling (fast mode only): every matrix whose
    output is an fg gets its gate-half COLUMNS scaled by 0.5 (fc0, fp0,
    w_p0c, w_fg, w_prod, final b_fg), and every matrix consuming
    `gated` gets its ROWS scaled by 0.5 (w_prod, w_out).  The kernel
    then computes the gate as v = tanh(fg'); gated' = v0*v1 + v0
    = 2*tanh(f)*sigmoid(g) — ONE transcendental on the critical chain
    instead of tanh + sigmoid (measured -0.36 us/step on v5e), with the
    factor 2 absorbed by the row scaling.

    Returns:
      w_prod: (L, R, 2R) = 0.5 * W_res_l @ W_cur_{l+1} * colscale
              (last layer zero);
      fc0/fp0: (C, 2R) folded front-embedding products (col-scaled);
      w_p0c: (R or 2R, 2R) = [W_past_0 (; W_ctx_0)] (col-scaled);
      w_fg_s / w_out_s: per-layer taps with the fast-mode scaling
              applied (replace sp["w_fg"] / sp["w_out"] in the kernel);
      b_corr: (L, 2R) additive bias correction, b_res_{l-1} @ W_cur_l
             (zero for layer 0) — added onto the final per-(layer,
             batch) fg bias rows (after global-conditioning shifts;
             the caller applies the gate-half 0.5 to the final bias).
    """
    r = model.residual_channels
    n_layers = len(model.dilations)
    w_fg, w_out, b_out = sp["w_fg"], sp["w_out"], sp["b_out"]
    colscale = jnp.concatenate([jnp.ones((r,), jnp.float32),
                                jnp.full((r,), 0.5, jnp.float32)])
    prods, b_corr = [], [jnp.zeros((2 * r,), jnp.float32)]
    for l in range(n_layers):
        if l + 1 < n_layers:
            w_cur_next = w_fg[l + 1][:r]            # (R, 2R)
            prods.append(jnp.dot(w_out[l][:, :r], w_cur_next,
                                 precision=_HI))
            b_corr.append(jnp.dot(b_out[l][:r], w_cur_next,
                                  precision=_HI))
        else:
            prods.append(jnp.zeros((r, 2 * r), jnp.float32))
    w_cur_0 = w_fg[0][:r]
    return {
        "w_prod": jnp.stack(prods) * 0.5 * colscale,
        "fc0": jnp.dot(sp["front_cur"], w_cur_0, precision=_HI)
        * colscale,
        "fp0": jnp.dot(sp["front_past"], w_cur_0, precision=_HI)
        * colscale,
        "w_p0c": w_fg[0][r:] * colscale,  # [W_past_0 (; W_ctx_0)]
        "w_fg_s": w_fg * colscale,
        "w_out_s": w_out * 0.5,
        "b_corr": jnp.stack(b_corr),
        "colscale": colscale,
    }


def _make_kernel(dilations, rf: int, n_samples: int, c_in: int, r: int,
                 s: int, batch: int, temperature: float,
                 parity_sampling: bool, has_ctx: bool,
                 fast: bool = False):
    offsets = np.concatenate([[0], np.cumsum(dilations)[:-1]]).tolist()
    n_layers = len(dilations)
    group = _LANES // batch  # timesteps packed per int32 row
    # fast mode trades bit-exactness for latency everywhere: default
    # (single-pass) MXU precision instead of HIGHEST — the 6-pass f32
    # algorithm costs ~40 ns extra latency PER dependent hop, ~1.2 us
    # over the 30-layer chain (measured, scripts/exp_sampler_variants)
    dot = (functools.partial(jnp.dot,
                             preferred_element_type=jnp.float32)
           if fast else _dot)

    def kernel(seed_ref,                      # SMEM (1,) int32
               init_codes_ref,                # VMEM (2, B) int32
               buf_init_ref,                  # VMEM (sum_d*B, R) f32
               front_cur_ref, front_past_ref,
               w_fg_ref, b_fg_ref, w_out_ref, b_out_ref,
               h1_w_ref, h1_b_ref, h2_w_ref, h2_b_ref,
               *rest):
        if fast:
            (fc0_ref, fp0_ref, w_p0c_ref, w_prod_ref, *rest) = rest
        else:
            fc0_ref = fp0_ref = w_p0c_ref = w_prod_ref = None
        if has_ctx:
            (ctx_hbm, out_ref, buf_ref, ctx_buf_ref, ctx_sem) = rest
        else:
            (out_ref, buf_ref) = rest
            ctx_hbm = ctx_buf_ref = ctx_sem = None

        # warm start: ring buffers pre-filled by the parallel prompt pass
        buf_ref[:, :] = buf_init_ref[:, :]

        col_iota_f = jax.lax.broadcasted_iota(
            jnp.int32, (batch, c_in), 1).astype(jnp.float32)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        eye_b = jnp.eye(batch, dtype=jnp.float32)

        # mu-law codes are < 256 = exactly representable in bf16, so the
        # packing pivots are exact even at single-pass MXU precision
        pivot_prec = None if fast else _HI

        def col_to_row(col_f):   # (B,1) f32 -> (1,B) f32, via MXU
            return jax.lax.dot_general(
                col_f, eye_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=pivot_prec)

        def row_to_col(row_f):   # (1,B) f32 -> (B,1) f32
            return jax.lax.dot_general(
                eye_b, row_f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=pivot_prec)

        def ctx_dma(chunk_idx, slot):
            rows = _CTX_CHUNK * batch
            return pltpu.make_async_copy(
                ctx_hbm.at[pl.ds(chunk_idx * rows, rows), :],
                ctx_buf_ref.at[pl.ds(slot * rows, rows), :],
                ctx_sem.at[slot],
            )

        if has_ctx:
            ctx_dma(rf // _CTX_CHUNK, 0).start()

        def step(t, carry):
            prev_oh, cur_col_f, out_row = carry
            # input at position t is always the carried sample (the
            # prompt was consumed by the parallel warm-start pass)
            code_col_f = cur_col_f
            code_oh = (col_iota_f == code_col_f).astype(jnp.float32)

            h = None
            if not fast:
                h = _dot(code_oh, front_cur_ref[:, :]) \
                    + _dot(prev_oh, front_past_ref[:, :])   # (B, R)

            # ---- context features for step t (double-buffered DMA)
            if has_ctx:
                chunk = t // _CTX_CHUNK
                slot = jax.lax.rem(chunk - rf // _CTX_CHUNK, 2)
                within = jax.lax.rem(t, _CTX_CHUNK)

                @pl.when(jnp.logical_or(within == 0, t == rf))
                def _():
                    ctx_dma(chunk, slot).wait()
                    nxt = chunk + 1
                    @pl.when(nxt * _CTX_CHUNK < n_samples)
                    def _():
                        ctx_dma(nxt,
                                jax.lax.rem(nxt - rf // _CTX_CHUNK, 2)
                                ).start()

                ctx_row = ctx_buf_ref[
                    pl.ds((slot * _CTX_CHUNK + within) * batch, batch), :]
                ctx_t = ctx_row[:, :r]   # strip the 128-lane DMA padding
            else:
                ctx_t = None

            skip_sum = jnp.zeros((batch, s), jnp.float32)

            def slot_of(l):
                return (offsets[l]
                        + jax.lax.rem(t, dilations[l])) * batch

            def fg_of(l, h_in):
                past = buf_ref[pl.ds(slot_of(l), batch), :]  # (B, R)
                hp = jnp.concatenate(
                    [h_in, past] + ([ctx_t] if has_ctx else []), axis=1)
                return dot(hp, w_fg_ref[l]) \
                    + b_fg_ref[pl.ds(l * batch, batch), :]

            if fast:
                # short critical path (see stack_fast_weights): the
                # dependency chain is onehot -> fc0 matmul -> per layer
                # (gating -> w_prod matmul); everything else (front
                # embedding, layer outputs, the next layer's `pre`)
                # depends only on one-layer-old values and overlaps in
                # the MXU pipeline.  Weights carry the packed-tanh
                # scaling: fg = [f | g/2] and gated' = 2*gated, so the
                # gate costs ONE tanh + one fma on the chain.
                past0 = buf_ref[pl.ds(slot_of(0), batch), :]
                p0c = jnp.concatenate(
                    [past0] + ([ctx_t] if has_ctx else []), axis=1)
                fg = dot(code_oh, fc0_ref[:, :]) \
                    + (dot(prev_oh, fp0_ref[:, :])
                       + dot(p0c, w_p0c_ref[:, :])
                       + b_fg_ref[pl.ds(0, batch), :])
                h = dot(code_oh, front_cur_ref[:, :]) \
                    + dot(prev_oh, front_past_ref[:, :])
                for l in range(n_layers):
                    slot_l = slot_of(l)
                    v = jnp.tanh(fg)
                    gated = v[:, :r] * v[:, r:] + v[:, :r]
                    bo = b_out_ref[pl.ds(l, 1), :]
                    if l + 1 < n_layers:
                        fgp = dot(gated, w_prod_ref[l])    # critical
                        pre = fg_of(l + 1, h)              # off-path
                        out = dot(gated, w_out_ref[l]) + bo
                        buf_ref[pl.ds(slot_l, batch), :] = h
                        skip_sum = skip_sum + out[:, r:]
                        h = out[:, :r] + h
                        fg = fgp + pre
                    else:
                        out = dot(gated, w_out_ref[l]) + bo
                        buf_ref[pl.ds(slot_l, batch), :] = h
                        skip_sum = skip_sum + out[:, r:]
            else:
                for l in range(n_layers):
                    slot_l = slot_of(l)
                    fg = fg_of(l, h)
                    gated = jnp.tanh(fg[:, :r]) \
                        * jax.nn.sigmoid(fg[:, r:])
                    out = _dot(gated, w_out_ref[l]) \
                        + b_out_ref[pl.ds(l, 1), :]
                    skip_sum = skip_sum + out[:, r:]
                    buf_ref[pl.ds(slot_l, batch), :] = h
                    h = out[:, :r] + h

            y = dot(jax.nn.leaky_relu(skip_sum), h1_w_ref[:, :]) \
                + h1_b_ref[pl.ds(0, 1), :]
            logits = dot(jax.nn.leaky_relu(y), h2_w_ref[:, :]) \
                + h2_b_ref[pl.ds(0, 1), :]                   # (B, C)

            if temperature == 0.0:
                scores = logits
            else:
                if parity_sampling:
                    scores = jax.nn.softmax(logits, -1) / temperature
                else:
                    scores = logits / temperature
                # POSITIONAL Gumbel-max (see _positional_gumbel): the
                # draw for a position is a pure function of (seed, t),
                # not of how many draws preceded it — the property
                # that lets the speculative kernel reproduce this
                # exact stream while consuming positions two at a time
                # (a sequential stream would diverge on the first
                # committed speculation)
                scores = scores + _positional_gumbel(
                    seed_ref[0], t, batch, c_in)
            # manual argmax (first max index): Mosaic cannot lower
            # jnp.argmax's f32->i32 vector materialization
            m = jnp.max(scores, axis=-1, keepdims=True)
            cand = jnp.where(scores == m, col_iota_f, float(c_in))
            nxt_col_f = jnp.min(cand, axis=-1, keepdims=True)  # (B,1)

            # ---- lane-pack the consumed code into the staging row
            pos = jax.lax.rem(t - rf, group)
            code_row = col_to_row(code_col_f).astype(jnp.int32)  # (1,B)
            tiled = pltpu.repeat(code_row, group, axis=1)        # (1,128)
            mask = (lane_iota >= pos * batch) & \
                   (lane_iota < (pos + 1) * batch)
            out_row = jnp.where(mask, tiled, out_row)

            @pl.when(jnp.logical_or(pos == group - 1,
                                    t == n_samples - 1))
            def _():
                out_ref[pl.ds((t - rf) // group, 1), :] = out_row

            out_row = jnp.where(pos == group - 1,
                                jnp.zeros_like(out_row), out_row)
            return (code_oh, nxt_col_f, out_row)

        prev_row = init_codes_ref[pl.ds(0, 1), :].astype(jnp.float32)
        cur_row = init_codes_ref[pl.ds(1, 1), :].astype(jnp.float32)
        prev_col_f = row_to_col(prev_row)
        prev_oh0 = (col_iota_f == prev_col_f).astype(jnp.float32)
        carry = (prev_oh0, row_to_col(cur_row),
                 jnp.zeros((1, _LANES), jnp.int32))
        jax.lax.fori_loop(rf, n_samples, step, carry)

    return kernel


def _make_spec_kernel(dilations, rf: int, n_samples: int, c_in: int,
                      r: int, s: int, fast: bool = False,
                      adaptive: bool = True, temperature: float = 0.0,
                      parity_sampling: bool = True, order: int = 2,
                      depth: int = 1):
    """Speculative-wavefront EXACT sampler (B=1, no video).

    temperature > 0 (round 4): sampling speculates too.  Both kernels
    draw POSITIONAL Gumbel noise (reseed from (seed, position) per
    head evaluation), so the draw for position t is a pure function of
    t — the speculative kernel evaluates positions t and t+1 in one
    iteration and still reproduces the standard kernel's stream
    bit-exactly; a commit requires the SAMPLED x_{t+1} to equal the
    guess, so output stays bit-identical at any temperature.  Hit rate
    at temperature>0 is bounded by the model's per-step confidence
    (P[sample == mode]), so speculation degrades gracefully toward the
    miss regime on high-entropy models.

    Runs step t's chain and a speculative step-(t+1) chain skewed by
    ONE layer in the same iteration.  ``depth == 2`` (flag-gated,
    both kernel variants) adds a third chain skewed TWO layers that
    evaluates step t+2 under the guess pair (g1, g2 = table[x_t, g1]);
    when both guesses match the real argmax chain the iteration
    commits three samples (measured on the trained sine fixture:
    2.14x steps/iteration vs 1.79x at depth 1).  Its ring taps at t+2
    are s1's layer-l input for d == 1, the real chain's for d == 2
    (slot_of(l, t+2) == slot_of(l, t)), and untouched ring state for
    d > 2; commits apply in time order (real, s1, s2) so coincident
    slots keep the latest input.  The guess g comes from an n-gram
    side table — ``order == 2``: g = T2[x_t], a (C, 1) successor
    column; ``order == 3`` (the production default): g = T3[x_{t-1},
    x_t] from a (C, C) pair table, falling back to the T2 row where
    the pair is unseen.  Measured on the trained sine fixture (400
    greedy samples, interpret mode): order 2 hits 29.0% of iterations
    (1.29x steps/iteration), order 3 hits 79.4% (1.79x) — the pair
    key disambiguates rising vs falling edges that share a code.
    Tables are seeded from the prompt; with ``adaptive=True``
    — the default — the table LEARNS online: every committed transition
    x_t -> x_{t+1} overwrites its row with a couple of (C, 1) vector
    selects that ride entirely off the sample's dependency chain, so
    the guesser tracks the trained model's own output statistics
    instead of freezing at the prompt — round-3 VERDICT item 7).  The
    spec chain's layer-l past tap at t+1 is the real chain's layer-l
    input for d == 1 (in-register) and untouched ring state for d > 1,
    so both chains are available without extra memory traffic.  Spec
    ring writes and the second output code commit only when
    argmax(logits_t) == g — output is therefore BIT-IDENTICAL to the
    non-speculative exact kernel for ANY guess sequence; a hit advances
    two steps for L+1 dependent hops (the spec matmuls ride the real
    chain's dependency shadow).  A (1, 128) hit counter is emitted as a
    second output so hit rates are measurable per run.  Replaces the
    reference's naive per-sample full-forward loop
    (/root/reference/movenet/wavenet.py:193-239).
    """
    offsets = np.concatenate([[0], np.cumsum(dilations)[:-1]]).tolist()
    n_layers = len(dilations)
    dot = (functools.partial(jnp.dot,
                             preferred_element_type=jnp.float32)
           if fast else _dot)

    def kernel(seed_ref, init_codes_ref, buf_init_ref, t2_ref, *rest):
        if order == 3:
            t3_ref, *rest = rest
        (front_cur_ref, front_past_ref,
         w_fg_ref, b_fg_ref, w_out_ref, b_out_ref,
         h1_w_ref, h1_b_ref, h2_w_ref, h2_b_ref, *rest) = rest
        if fast:
            (fc0_ref, fp0_ref, w_p0c_ref, w_prod_ref,
             out_ref, hits_ref, buf_ref, t2_buf, *scr) = rest
        else:
            out_ref, hits_ref, buf_ref, t2_buf, *scr = rest
        if order == 3:
            (t3_buf,) = scr
        buf_ref[:, :] = buf_init_ref[:, :]
        t2_buf[:, :] = t2_ref[:, :]
        if order == 3:
            t3_buf[:, :] = t3_ref[:, :]
        col_iota_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, c_in), 1).astype(jnp.float32)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        row_iota_f = jax.lax.broadcasted_iota(
            jnp.int32, (c_in, 1), 0).astype(jnp.float32)

        def head(skip_sum, tt):
            y = dot(jax.nn.leaky_relu(skip_sum), h1_w_ref[:, :]) \
                + h1_b_ref[pl.ds(0, 1), :]
            logits = dot(jax.nn.leaky_relu(y), h2_w_ref[:, :]) \
                + h2_b_ref[pl.ds(0, 1), :]
            if temperature == 0.0:
                return logits
            # positional Gumbel-max: identical formula and (seed, tt)
            # keying as the standard kernel's temperature branch
            if parity_sampling:
                scores = jax.nn.softmax(logits, -1) / temperature
            else:
                scores = logits / temperature
            return scores + _positional_gumbel(seed_ref[0], tt, 1,
                                               c_in)

        def argmax_col(scores):
            m = jnp.max(scores, axis=-1, keepdims=True)
            cand = jnp.where(scores == m, col_iota_f, float(c_in))
            return jnp.min(cand, axis=-1, keepdims=True)     # (1, 1)

        def body(carry):
            t, prev_oh, cur_col_f, out_row, hits_row = carry
            code_oh = (col_iota_f == cur_col_f).astype(jnp.float32)
            h = dot(code_oh, front_cur_ref[:, :]) \
                + dot(prev_oh, front_past_ref[:, :])
            # n-gram guess for x_{t+1}; -1 table rows one-hot to zeros
            # and naturally miss.  order == 3: the (C, C) pair table
            # T3[x_{t-1}, x_t] disambiguates contexts a 2-gram
            # collapses (e.g. the same code on the rising vs falling
            # edge of a quasi-periodic waveform), falling back to the
            # 2-gram row where the pair is unseen.  The lookup is two
            # extra VPU/MXU issues at iteration start; like every part
            # of the guess, it can only change the hit RATE.
            g_col_f = _dot(code_oh, t2_buf[:, :])            # (1, 1)
            if order == 3:
                row3 = _dot(prev_oh, t3_buf[:, :])           # (1, C)
                g3 = jnp.sum(row3 * code_oh, axis=-1,
                             keepdims=True)                  # (1, 1)
                g_col_f = jnp.where(g3 >= 0.0, g3, g_col_f)
            g_oh = (col_iota_f == g_col_f).astype(jnp.float32)
            hs = dot(g_oh, front_cur_ref[:, :]) \
                + dot(code_oh, front_past_ref[:, :])
            if depth == 2:
                # second-hop guess g2 for x_{t+2}, keyed on (x_t, g1).
                # When g1 is -1 (no guess) g_oh is all-zero and g2
                # degenerates to 0 — harmless: hit2 requires hit1,
                # which a -1 g1 already fails, so a garbage g2 only
                # wastes the s2 chain's shadow issues this iteration.
                g2_col_f = _dot(g_oh, t2_buf[:, :])          # (1, 1)
                if order == 3:
                    row3b = _dot(code_oh, t3_buf[:, :])      # (1, C)
                    g23 = jnp.sum(row3b * g_oh, axis=-1,
                                  keepdims=True)
                    has3 = jnp.sum(g_oh * (row3b >= 0.0),
                                   axis=-1, keepdims=True)
                    g2_col_f = jnp.where(has3 > 0.0, g23, g2_col_f)
                g2_oh = (col_iota_f == g2_col_f).astype(jnp.float32)
                hs2 = dot(g2_oh, front_cur_ref[:, :]) \
                    + dot(g_oh, front_past_ref[:, :])

            def slot_of(l, tt):
                return offsets[l] + jax.lax.rem(tt, dilations[l])

            skip_sum = jnp.zeros((1, s), jnp.float32)
            skip_sum_s = jnp.zeros((1, s), jnp.float32)
            skip_sum_s2 = jnp.zeros((1, s), jnp.float32)
            spec_writes = []
            s2_writes = []
            if fast:
                # fast-chain wavefront: same packed-tanh short-critical
                # -path structure as _make_kernel's fast branch, twice,
                # skewed by one layer; the spec fgp/pre pair reads the
                # real chain's layer-(l+1) input for its d==1 tap
                def fg_of(l, h_in, past_in):
                    return dot(jnp.concatenate([h_in, past_in], 1),
                               w_fg_ref[l]) + b_fg_ref[pl.ds(l, 1), :]

                past0 = buf_ref[pl.ds(slot_of(0, t), 1), :]
                fg = dot(code_oh, fc0_ref[:, :]) \
                    + (dot(prev_oh, fp0_ref[:, :])
                       + dot(past0, w_p0c_ref[:, :])
                       + b_fg_ref[pl.ds(0, 1), :])
                # layer-0 tap at t+1 (d == 1) is the real front embed h
                fg_s = dot(g_oh, fc0_ref[:, :]) \
                    + (dot(code_oh, fp0_ref[:, :])
                       + dot(h, w_p0c_ref[:, :])
                       + b_fg_ref[pl.ds(0, 1), :])
                if depth == 2:
                    # layer-0 tap at t+2 is s1's front embed hs
                    fg_s2 = dot(g2_oh, fc0_ref[:, :]) \
                        + (dot(g_oh, fp0_ref[:, :])
                           + dot(hs, w_p0c_ref[:, :])
                           + b_fg_ref[pl.ds(0, 1), :])
                for l in range(n_layers):
                    slot_l = slot_of(l, t)
                    d = dilations[l]
                    slot_s = slot_l if d == 1 else slot_of(l, t + 1)
                    v = jnp.tanh(fg)
                    gated = v[:, :r] * v[:, r:] + v[:, :r]
                    v_s = jnp.tanh(fg_s)
                    gated_s = v_s[:, :r] * v_s[:, r:] + v_s[:, :r]
                    bo = b_out_ref[pl.ds(l, 1), :]
                    outl = dot(gated, w_out_ref[l]) + bo
                    outl_s = dot(gated_s, w_out_ref[l]) + bo
                    if depth == 2:
                        slot_s2 = slot_l if d <= 2 else slot_of(l, t + 2)
                        v_s2 = jnp.tanh(fg_s2)
                        gated_s2 = v_s2[:, :r] * v_s2[:, r:] \
                            + v_s2[:, :r]
                        outl_s2 = dot(gated_s2, w_out_ref[l]) + bo
                    if l + 1 < n_layers:
                        fgp = dot(gated, w_prod_ref[l])     # critical
                        fgp_s = dot(gated_s, w_prod_ref[l])
                        d1 = dilations[l + 1]
                        past_n = buf_ref[pl.ds(slot_of(l + 1, t), 1), :]
                        pre = fg_of(l + 1, h, past_n)
                        h_next = outl[:, :r] + h
                        hs_next = outl_s[:, :r] + hs
                        if d1 == 1:
                            past_ns = h_next
                        else:
                            past_ns = buf_ref[
                                pl.ds(slot_of(l + 1, t + 1), 1), :]
                        pre_s = fg_of(l + 1, hs, past_ns)
                        if depth == 2:
                            fgp_s2 = dot(gated_s2, w_prod_ref[l])
                            # s2's layer-(l+1) tap at t+2: s1's input
                            # for d1 == 1, the real chain's for
                            # d1 == 2, untouched ring state otherwise
                            if d1 == 1:
                                past_ns2 = hs_next
                            elif d1 == 2:
                                past_ns2 = h_next
                            else:
                                past_ns2 = buf_ref[
                                    pl.ds(slot_of(l + 1, t + 2), 1), :]
                            pre_s2 = fg_of(l + 1, hs2, past_ns2)
                        buf_ref[pl.ds(slot_l, 1), :] = h
                        spec_writes.append((slot_s, hs))
                        skip_sum = skip_sum + outl[:, r:]
                        skip_sum_s = skip_sum_s + outl_s[:, r:]
                        h = h_next
                        hs = hs_next
                        fg = fgp + pre
                        fg_s = fgp_s + pre_s
                        if depth == 2:
                            s2_writes.append((slot_s2, hs2))
                            skip_sum_s2 = skip_sum_s2 + outl_s2[:, r:]
                            hs2 = outl_s2[:, :r] + hs2
                            fg_s2 = fgp_s2 + pre_s2
                    else:
                        buf_ref[pl.ds(slot_l, 1), :] = h
                        spec_writes.append((slot_s, hs))
                        skip_sum = skip_sum + outl[:, r:]
                        skip_sum_s = skip_sum_s + outl_s[:, r:]
                        if depth == 2:
                            s2_writes.append((slot_s2, hs2))
                            skip_sum_s2 = skip_sum_s2 + outl_s2[:, r:]
            else:
                for l in range(n_layers):
                    d = dilations[l]
                    slot_r = slot_of(l, t)

                    def gate_layer(h_in, past, l=l):
                        fg_l = _dot(
                            jnp.concatenate([h_in, past], axis=1),
                            w_fg_ref[l]) + b_fg_ref[pl.ds(l, 1), :]
                        gated_l = jnp.tanh(fg_l[:, :r]) \
                            * jax.nn.sigmoid(fg_l[:, r:])
                        return _dot(gated_l, w_out_ref[l]) \
                            + b_out_ref[pl.ds(l, 1), :]

                    outl = gate_layer(h, buf_ref[pl.ds(slot_r, 1), :])
                    # spec layer l, one behind: its past tap at t+1 is
                    # the real chain's layer-l input for d == 1, ring
                    # state (untouched this iteration) otherwise
                    if d == 1:
                        past_s, slot_s = h, slot_r
                    else:
                        slot_s = slot_of(l, t + 1)
                        past_s = buf_ref[pl.ds(slot_s, 1), :]
                    outl_s = gate_layer(hs, past_s)
                    if depth == 2:
                        # s2, two behind: its past tap at t+2 is s1's
                        # layer-l input for d == 1, the real chain's
                        # for d == 2 (slot_of(l, t+2) == slot_r), ring
                        # state (untouched this iteration) for d > 2
                        if d == 1:
                            past_s2, slot_s2 = hs, slot_r
                        elif d == 2:
                            past_s2, slot_s2 = h, slot_r
                        else:
                            slot_s2 = slot_of(l, t + 2)
                            past_s2 = buf_ref[pl.ds(slot_s2, 1), :]
                        outl_s2 = gate_layer(hs2, past_s2)
                        s2_writes.append((slot_s2, hs2))
                        skip_sum_s2 = skip_sum_s2 + outl_s2[:, r:]
                    buf_ref[pl.ds(slot_r, 1), :] = h
                    spec_writes.append((slot_s, hs))
                    skip_sum = skip_sum + outl[:, r:]
                    skip_sum_s = skip_sum_s + outl_s[:, r:]
                    h = outl[:, :r] + h
                    hs = outl_s[:, :r] + hs
                    if depth == 2:
                        hs2 = outl_s2[:, :r] + hs2

            nxt = argmax_col(head(skip_sum, t))              # x_{t+1}
            nxt_s = argmax_col(head(skip_sum_s, t + 1))  # x_{t+2} hit
            hit_n = jnp.sum((nxt == g_col_f).astype(jnp.int32))
            hit = jnp.logical_and(hit_n > 0, t + 1 < n_samples)
            if depth == 2:
                # x_{t+3}, valid when BOTH guesses committed
                nxt_s2 = argmax_col(head(skip_sum_s2, t + 2))
                hit2_n = jnp.sum((nxt_s == g2_col_f).astype(jnp.int32))
                hit2 = jnp.logical_and(
                    hit, jnp.logical_and(hit2_n > 0,
                                         t + 2 < n_samples))

            @pl.when(hit)
            def _():
                # commit the speculative ring writes: they are exactly
                # what real step t+1 would have written.  d == 1 slots
                # were overwritten by the real write above; restore
                # them with the spec value (same slot index).
                for slot_s, hv in spec_writes:
                    buf_ref[pl.ds(slot_s, 1), :] = hv

            if depth == 2:
                @pl.when(hit2)
                def _():
                    # s2 commits AFTER s1's: d <= 2 slots coincide with
                    # the real/s1 writes above and the latest time must
                    # win (the ring keeps the most recent d inputs)
                    for slot_s2, hv in s2_writes:
                        buf_ref[pl.ds(slot_s2, 1), :] = hv

            if adaptive:
                # learned 2-gram side table: record the observed
                # transition x_t -> x_{t+1} (and, on a hit, also
                # x_{t+1} -> x_{t+2}).  Two (C, 1) vector selects, no
                # scalar extraction, entirely off the sample chain —
                # only the hit RATE depends on the table, never the
                # output.  Write order matters when x_t == x_{t+1}
                # (self-transition): the later transition wins, keeping
                # the "most recent successor" semantics.
                t2_buf[:, :] = jnp.where(row_iota_f == cur_col_f,
                                         nxt, t2_buf[:, :])

                @pl.when(hit)
                def _():
                    t2_buf[:, :] = jnp.where(row_iota_f == g_col_f,
                                             nxt_s, t2_buf[:, :])

                if depth == 2:
                    @pl.when(hit2)
                    def _():
                        t2_buf[:, :] = jnp.where(
                            row_iota_f == g2_col_f, nxt_s2,
                            t2_buf[:, :])

                if order == 3:
                    # pair-table update: T3[x_{t-1}, x_t] = x_{t+1}
                    # via a broadcast (C,1)&(1,C) rank-1 mask select —
                    # still off the sample chain; on a hit also
                    # T3[x_t, x_{t+1}] = x_{t+2} (later write wins on
                    # coincident cells, same most-recent semantics)
                    prev_col_f = _dot(prev_oh, row_iota_f)   # (1, 1)
                    t3_buf[:, :] = jnp.where(
                        jnp.logical_and(row_iota_f == prev_col_f,
                                        col_iota_f == cur_col_f),
                        nxt, t3_buf[:, :])

                    @pl.when(hit)
                    def _():
                        t3_buf[:, :] = jnp.where(
                            jnp.logical_and(row_iota_f == cur_col_f,
                                            col_iota_f == g_col_f),
                            nxt_s, t3_buf[:, :])

                    if depth == 2:
                        @pl.when(hit2)
                        def _():
                            t3_buf[:, :] = jnp.where(
                                jnp.logical_and(
                                    row_iota_f == g_col_f,
                                    col_iota_f == g2_col_f),
                                nxt_s2, t3_buf[:, :])

            def emit(row, col_f, te):
                pos = jax.lax.rem(te - rf, _LANES)
                tiled = pltpu.repeat(col_f.astype(jnp.int32), _LANES, 1)
                mask = lane_iota == pos
                return jnp.where(mask, tiled, row), pos

            out_row1, pos1 = emit(out_row, cur_col_f, t)

            @pl.when(jnp.logical_or(pos1 == _LANES - 1,
                                    t == n_samples - 1))
            def _():
                out_ref[pl.ds((t - rf) // _LANES, 1), :] = out_row1
            out_row1 = jnp.where(pos1 == _LANES - 1,
                                 jnp.zeros_like(out_row1), out_row1)

            out_row2, pos2 = emit(out_row1, g_col_f, t + 1)

            @pl.when(jnp.logical_and(hit, jnp.logical_or(
                pos2 == _LANES - 1, t + 1 == n_samples - 1)))
            def _():
                out_ref[pl.ds((t + 1 - rf) // _LANES, 1), :] = out_row2
            out_row2 = jnp.where(pos2 == _LANES - 1,
                                 jnp.zeros_like(out_row2), out_row2)

            hit_i = hit.astype(jnp.int32)
            hit_f = hit.astype(jnp.float32)
            if depth == 2:
                out_row3, pos3 = emit(out_row2, g2_col_f, t + 2)

                @pl.when(jnp.logical_and(hit2, jnp.logical_or(
                    pos3 == _LANES - 1, t + 2 == n_samples - 1)))
                def _():
                    out_ref[pl.ds((t + 2 - rf) // _LANES, 1), :] = \
                        out_row3
                out_row3 = jnp.where(pos3 == _LANES - 1,
                                     jnp.zeros_like(out_row3),
                                     out_row3)
                hit2_i = hit2.astype(jnp.int32)
                hit2_f = hit2.astype(jnp.float32)
                nohit2 = 1.0 - hit2_f
                return (t + 1 + hit_i + hit2_i,
                        g2_oh * hit2_f
                        + nohit2 * (g_oh * hit_f
                                    + code_oh * (1.0 - hit_f)),
                        jnp.where(hit2, nxt_s2,
                                  jnp.where(hit, nxt_s, nxt)),
                        jnp.where(hit2, out_row3,
                                  jnp.where(hit, out_row2, out_row1)),
                        hits_row + hit_i + hit2_i)
            return (t + 1 + hit_i,
                    g_oh * hit_f + code_oh * (1.0 - hit_f),
                    jnp.where(hit, nxt_s, nxt),
                    jnp.where(hit, out_row2, out_row1),
                    hits_row + hit_i)

        def cond(carry):
            return carry[0] < n_samples

        prev_col_f = init_codes_ref[pl.ds(0, 1), :].astype(jnp.float32)
        cur_col_f = init_codes_ref[pl.ds(1, 1), :].astype(jnp.float32)
        prev_oh0 = (col_iota_f == prev_col_f).astype(jnp.float32)
        final = jax.lax.while_loop(cond, body, (
            jnp.int32(rf), prev_oh0, cur_col_f,
            jnp.zeros((1, _LANES), jnp.int32),
            jnp.zeros((1, _LANES), jnp.int32)))
        hits_ref[pl.ds(0, 1), :] = final[4]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("model", "n_samples", "temperature",
                     "parity_sampling", "interpret", "fast",
                     "speculative", "spec_adaptive", "spec_order",
                     "spec_depth", "return_stats"),
)
def pallas_generate(
    model: WaveNet,
    variables,
    prompt_codes: jnp.ndarray,     # (B, >=RF) int32, B in {1,2,4,8}
    n_samples: int,
    temperature: float = 0.0,
    seed: int = 0,
    video: Optional[jnp.ndarray] = None,
    parity_sampling: bool = True,
    labels: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    fast: bool = False,
    speculative: bool = False,
    spec_adaptive: bool = True,
    spec_order: int = 3,
    spec_depth: int = 1,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Generate (B, n_samples) mu-law codes with the VMEM-resident
    kernel.  Supports batch in {1, 2, 4, 8} and optional video
    conditioning (context streamed from HBM).

    ``fast=True`` trades bit-exactness for latency three ways
    (measured on v5e, scripts/exp_sampler_variants.py):
      * precomputed weight products leave ONE dependent matmul per
        layer on the sample chain (stack_fast_weights);
      * single-pass MXU precision instead of HIGHEST (the 6-pass f32
        algorithm costs ~1 us over the 30-layer flagship chain);
      * packed-tanh gating: one tanh + one fma per layer instead of
        tanh + sigmoid (the 0.5/2x factors live in the weights).
    Together: 10.5 -> ~6.5 us/step on the flagship config.  Outputs
    carry ~bf16 matmul precision — fine for trained models (logit
    margins dwarf 1e-2) and for temperature sampling; use the default
    exact kernel for bit-exactness against the scan sampler.
    """
    rf = model.receptive_fields
    if n_samples <= rf:
        raise ValueError(f"n_samples ({n_samples}) must exceed RF ({rf})")
    batch = prompt_codes.shape[0]
    if batch not in (1, 2, 4, 8, 16, 32):
        raise ValueError(
            "pallas sampler supports batch sizes dividing 128 (up to "
            f"32), got {batch}; use fast_generate for other batch sizes")
    if speculative and (batch != 1 or video is not None):
        raise ValueError(
            "speculative sampling supports B=1 decoding without video "
            "(it is a LATENCY optimization; batch/video paths use the "
            "standard kernel)")
    if return_stats and not speculative:
        raise ValueError(
            "return_stats reports the speculative hit counter; it "
            "requires speculative=True")
    if spec_order not in (2, 3):
        raise ValueError(f"spec_order must be 2 or 3, got {spec_order}")
    if spec_depth not in (1, 2):
        raise ValueError(f"spec_depth must be 1 or 2, got {spec_depth}")

    dil = model.dilations
    sum_d = int(np.sum(dil))
    c_in, r, s = (model.input_channels, model.residual_channels,
                  model.skip_channels)
    ring_bytes = sum_d * batch * r * 4
    if ring_bytes > 48 * 1024 * 1024:
        raise ValueError(
            f"ring buffers need {ring_bytes/2**20:.0f} MiB VMEM at "
            f"batch={batch} (sum of dilations {sum_d}, R={r}); reduce "
            "the batch or use fast_generate")

    has_ctx = video is not None
    sp = stack_sampler_params(model, variables, with_context=has_ctx)
    prompt = prompt_codes[:, :rf].astype(jnp.int32)     # (B, rf)
    group = _LANES // batch
    out_rows = -(-(n_samples - rf) // group)
    seed_arr = jnp.asarray([seed], jnp.int32)

    ctx = None
    if has_ctx:
        ctx = model.apply(variables, video, method=WaveNet.encode_video)
        ctx = ctx.astype(jnp.float32)          # (B, T_ctx, R)

    # ---- global (category) conditioning: time-invariant per-layer
    # shifts folded into the per-(layer, batch) fg bias rows
    b_fg = jnp.broadcast_to(sp["b_fg"][:, None, :],
                            (sp["b_fg"].shape[0], batch,
                             sp["b_fg"].shape[1]))
    global_vec = None
    if labels is not None and model.global_classes:
        global_vec = model.apply(
            variables, labels, method=WaveNet.embed_global)
        global_vec = global_vec.astype(jnp.float32)
        p = variables["params"] if "params" in variables else variables
        shifts = jnp.einsum(
            "br,lro->lbo", global_vec,
            jnp.asarray(p["blocks_global_kernel"], jnp.float32),
            precision=_HI)                               # (L, B, 2R)
        b_fg = b_fg + shifts
    sp = dict(sp)
    fw = None
    if fast:
        fw = stack_fast_weights(model, sp)
        b_fg = (b_fg + fw["b_corr"][:, None, :]) * fw["colscale"]
        sp["w_fg"] = fw["w_fg_s"]    # packed-tanh gate scaling
        sp["w_out"] = fw["w_out_s"]
    sp["b_fg"] = b_fg.reshape(-1, b_fg.shape[-1])        # (L*B, 2R)

    # ---- warm start: parallel prompt pass fills the ring buffers and
    # yields the logits for the first generated position
    ctx_prompt = None if ctx is None else ctx[:, :rf]
    buffers, last_logits = model.apply(
        variables, prompt, ctx_prompt, global_vec,
        method=WaveNet.prompt_state)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), rf - 1)
    if temperature == 0.0:
        first = jnp.argmax(last_logits, axis=-1)
    elif parity_sampling:
        probs = jax.nn.softmax(last_logits, axis=-1)
        first = jax.random.categorical(key, probs / temperature, axis=-1)
    else:
        first = jax.random.categorical(key, last_logits / temperature,
                                       axis=-1)
    init_codes = jnp.stack(
        [prompt[:, -1], first.astype(jnp.int32)])        # (2, B)
    buf_init = jnp.concatenate(
        [jnp.swapaxes(b.astype(jnp.float32), 0, 1).reshape(-1, r)
         for b in buffers], axis=0)                      # (sum_d*B, R)

    inputs = [seed_arr, init_codes, buf_init,
              sp["front_cur"], sp["front_past"], sp["w_fg"], sp["b_fg"],
              sp["w_out"], sp["b_out"], sp["h1_w"], sp["h1_b"],
              sp["h2_w"], sp["h2_b"]]
    if fast:
        inputs += [fw["fc0"], fw["fp0"], fw["w_p0c"], fw["w_prod"]]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [vmem] * (len(inputs) - 1)
    scratch = [pltpu.VMEM((sum_d * batch, r), jnp.float32)]

    if has_ctx:
        t_pad = -(-n_samples // _CTX_CHUNK) * _CTX_CHUNK
        if ctx.shape[1] < t_pad:
            ctx = jnp.pad(ctx, ((0, 0), (0, t_pad - ctx.shape[1]),
                                (0, 0)))
        ctx = ctx[:, :t_pad]
        # row-major by (time, batch): row t*B + b.  DMA slabs must be
        # 128-lane aligned, so the feature dim is padded to 128.
        r_pad = -(-r // _LANES) * _LANES
        ctx_tb = jnp.swapaxes(ctx, 0, 1).reshape(t_pad * batch, r)
        ctx_tb = jnp.pad(ctx_tb, ((0, 0), (0, r_pad - r)))
        inputs.append(ctx_tb)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        scratch = [
            pltpu.VMEM((sum_d * batch, r), jnp.float32),
            pltpu.VMEM((2 * _CTX_CHUNK * batch, r_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    if speculative:
        # n-gram guesser seeded from the prompt (see _make_spec_kernel;
        # scatter order for repeated pairs is unspecified under jit —
        # that only shifts the hit RATE, never the output, which is
        # bit-identical to the non-speculative exact kernel).  With
        # spec_adaptive (default) the kernel keeps LEARNING the table
        # from its own committed transitions.  spec_order=3 (default)
        # adds a (C, C) pair table with 2-gram fallback; it
        # auto-downgrades to 2 when the (C, C) f32 table would not
        # sensibly fit VMEM (c_in > 1024: >4 MiB).
        order = spec_order if c_in <= 1024 else 2
        t2 = jnp.full((c_in, 1), -1.0, jnp.float32)
        t2 = t2.at[prompt[0, :-1], 0].set(
            prompt[0, 1:].astype(jnp.float32))
        spec_inputs = [seed_arr, init_codes, buf_init, t2,
                       sp["front_cur"], sp["front_past"], sp["w_fg"],
                       sp["b_fg"], sp["w_out"], sp["b_out"],
                       sp["h1_w"], sp["h1_b"], sp["h2_w"], sp["h2_b"]]
        if order == 3:
            t3 = jnp.full((c_in, c_in), -1.0, jnp.float32)
            t3 = t3.at[prompt[0, :-2], prompt[0, 1:-1]].set(
                prompt[0, 2:].astype(jnp.float32))
            spec_inputs.insert(4, t3)
        if fast:
            spec_inputs += [fw["fc0"], fw["fp0"], fw["w_p0c"],
                            fw["w_prod"]]
        out, hits = pl.pallas_call(
            _make_spec_kernel(dil, rf, n_samples, c_in, r, s,
                              fast=fast, adaptive=spec_adaptive,
                              temperature=float(temperature),
                              parity_sampling=parity_sampling,
                              order=order, depth=spec_depth),
            out_shape=(jax.ShapeDtypeStruct((out_rows, _LANES),
                                            jnp.int32),
                       jax.ShapeDtypeStruct((1, _LANES), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [vmem] * (len(spec_inputs) - 1),
            out_specs=(vmem, vmem),
            scratch_shapes=[pltpu.VMEM((sum_d, r), jnp.float32),
                            pltpu.VMEM((c_in, 1), jnp.float32)]
            + ([pltpu.VMEM((c_in, c_in), jnp.float32)]
               if order == 3 else []),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*spec_inputs)
        gen = out.reshape(out_rows, group, batch)
        gen = jnp.transpose(gen, (2, 0, 1)).reshape(batch, -1)
        codes = jnp.concatenate([prompt, gen], axis=1)[:, :n_samples]
        if return_stats:
            # every lane carries the same count; hits/(n_samples-rf)
            # is the fraction of samples that came from committed
            # speculation (hit rate ~= hits / iterations)
            return codes, hits[0, 0]
        return codes

    kernel = _make_kernel(dil, rf, n_samples, c_in, r, s, batch,
                          float(temperature), parity_sampling, has_ctx,
                          fast=fast)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, _LANES), jnp.int32),
        in_specs=in_specs,
        out_specs=vmem,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    # unpack lanes: row r, lane p*B+b  ->  (b, rf + r*group + p)
    gen = out.reshape(out_rows, group, batch)
    gen = jnp.transpose(gen, (2, 0, 1)).reshape(batch, -1)
    return jnp.concatenate([prompt, gen], axis=1)[:, :n_samples]
