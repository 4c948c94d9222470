"""Single-kernel autoregressive WaveNet sampler (Pallas, TPU).

The lax.scan sampler (models/sampler.py) already removes the
reference's O(T*RF) recomputation, but each scan iteration still
re-reads every weight from HBM (~3.7 MB/step for the flagship config)
and pays XLA while-loop step overhead.  This kernel keeps ALL weights
and the per-layer dilation ring buffers resident in VMEM and runs the
entire generation loop inside one ``pallas_call``:

  * per step: front-embedding gather via a one-hot MXU matmul (no
    scalar extraction), L unrolled gated-residual blocks as (1,R)x(R,2R)
    VMEM matmuls, dilation ring buffers as dynamic row slices of one
    packed (sum_dilations, R) scratch buffer, head matmuls, then greedy
    argmax or Gumbel-max sampling from the on-core PRNG.
  * prompt and output codes are packed as (ceil(T/128), 128) int32
    tiles; per-step lane access is a vectorized select/insert against a
    lane iota, so no scalar memory traffic and no 128x lane-padding
    blowup.
  * weights are stacked per-layer (L, R, 2R)/(L, R, R)/... so the
    kernel takes a handful of refs instead of 6*L.

Restrictions (the scan sampler remains the general path): batch size 1,
audio-only (no video conditioning).

Sampling matches models/sampler.py exactly for temperature=0 (greedy).
For temperature>0 a Gumbel-max draw replaces jax.random.categorical
(same distribution, different RNG stream): parity mode perturbs
softmax(logits)/T (the reference's double-softmax quirk), clean mode
perturbs logits/T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from movenet_tpu.models.wavenet import WaveNet

_LANES = 128


def stack_sampler_params(model: WaveNet, variables) -> dict:
    """Stack per-layer params into dense arrays for the kernel."""
    p = variables["params"] if "params" in variables else variables
    ls = [p[f"block_{i}"] for i in range(len(model.dilations))]

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    return {
        "front_cur": f32(p["front_cur"]),
        "front_past": f32(p["front_past"]),
        # fused per-layer weights: one (2R, 2R) tap matmul for [h|past]
        # and one (R, R+S) output matmul for [residual|skip]
        "w_fg": jnp.stack([
            jnp.concatenate([f32(l["w_cur"]), f32(l["w_past"])], axis=0)
            for l in ls]),
        "w_out": jnp.stack([
            jnp.concatenate([f32(l["residual_proj"]["kernel"]),
                             f32(l["skip_proj"]["kernel"])], axis=1)
            for l in ls]),
        "b_out": jnp.stack([
            jnp.concatenate([f32(l["residual_proj"]["bias"]),
                             f32(l["skip_proj"]["bias"])])
            for l in ls]),
        "h1_w": f32(p["head1"]["kernel"]),
        "h1_b": f32(p["head1"]["bias"]).reshape(1, -1),
        "h2_w": f32(p["head2"]["kernel"]),
        "h2_b": f32(p["head2"]["bias"]).reshape(1, -1),
    }


def _make_kernel(dilations, rf: int, n_samples: int, c_in: int, r: int,
                 s: int, temperature: float, parity_sampling: bool):
    offsets = np.concatenate([[0], np.cumsum(dilations)[:-1]]).tolist()
    n_layers = len(dilations)

    def kernel(seed_ref,                      # SMEM (1,) int32
               prompt_ref,                    # VMEM (ceil(rf/128), 128)
               front_cur_ref, front_past_ref,
               w_fg_ref, w_out_ref, b_out_ref,
               h1_w_ref, h1_b_ref, h2_w_ref, h2_b_ref,
               out_ref,                       # VMEM (ceil(T/128), 128)
               buf_ref):                      # VMEM (sum_d, r) scratch
        if temperature > 0.0:
            pltpu.prng_seed(seed_ref[0])
        buf_ref[:, :] = jnp.zeros(buf_ref.shape, jnp.float32)

        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, c_in), 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

        def onehot_row(code):
            # code: (1, 1) int32 -> (1, C) one-hot f32
            return (col_iota == code).astype(jnp.float32)

        def step(t, carry):
            prev_code, cur_code, out_row = carry
            lane = jax.lax.rem(t, _LANES)
            tc = jnp.minimum(t, rf - 1)
            prow = prompt_ref[pl.ds(tc // _LANES, 1), :]     # (1, 128)
            prompt_t = jnp.sum(
                jnp.where(lane_iota == jax.lax.rem(tc, _LANES), prow, 0),
                axis=1, keepdims=True)                       # (1, 1)
            code_t = jnp.where(t < rf, prompt_t, cur_code)

            h = jnp.dot(onehot_row(code_t), front_cur_ref[:, :],
                        preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)   # (1, R)
            h_prev = jnp.dot(onehot_row(prev_code), front_past_ref[:, :],
                             preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            h = jnp.where(t > 0, h + h_prev, h)

            skip_sum = jnp.zeros((1, s), jnp.float32)
            for l in range(n_layers):
                d = dilations[l]
                slot = offsets[l] + jax.lax.rem(t, d)
                past = buf_ref[pl.ds(slot, 1), :]             # (1, R)
                hp = jnp.concatenate([h, past], axis=1)       # (1, 2R)
                fg = jnp.dot(hp, w_fg_ref[l],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                gated = jnp.tanh(fg[:, :r]) * jax.nn.sigmoid(fg[:, r:])
                out = jnp.dot(gated, w_out_ref[l],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST) \
                    + b_out_ref[pl.ds(l, 1), :]
                skip_sum = skip_sum + out[:, r:]
                buf_ref[pl.ds(slot, 1), :] = h
                h = out[:, :r] + h

            y = jnp.dot(jax.nn.leaky_relu(skip_sum), h1_w_ref[:, :],
                        preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST) \
                + h1_b_ref[pl.ds(0, 1), :]
            logits = jnp.dot(jax.nn.leaky_relu(y), h2_w_ref[:, :],
                             preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST) \
                + h2_b_ref[pl.ds(0, 1), :]                    # (1, C)

            if temperature == 0.0:
                scores = logits
            else:
                if parity_sampling:
                    # reference quirk: perturb softmax(logits)/T
                    scores = jax.nn.softmax(logits, -1) / temperature
                else:
                    scores = logits / temperature
                bits = pltpu.prng_random_bits((1, c_in))
                # Mosaic lacks uint32->f32; route through int32 (the
                # top 24 bits fit losslessly)
                b24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8,
                                    jnp.int32)
                u = b24.astype(jnp.float32) * (1.0 / (1 << 24))
                scores = scores - jnp.log(-jnp.log(u + 1e-20) + 1e-20)
            # manual argmax (first max index): Mosaic cannot lower
            # jnp.argmax's f32->i32 vector materialization
            m = jnp.max(scores, axis=-1, keepdims=True)
            cand = jnp.where(scores == m, col_iota, c_in)
            nxt = jnp.min(cand, axis=-1, keepdims=True).astype(jnp.int32)

            # lane-insert the consumed code into the staging row; flush
            # the row every 128 steps and at the end
            out_row = jnp.where(lane_iota == lane, code_t, out_row)

            @pl.when(jnp.logical_or(lane == _LANES - 1,
                                    t == n_samples - 1))
            def _():
                out_ref[pl.ds(t // _LANES, 1), :] = out_row

            out_row = jnp.where(lane == _LANES - 1,
                                jnp.zeros_like(out_row), out_row)
            return (code_t, nxt, out_row)

        zero = jnp.zeros((1, 1), jnp.int32)
        zrow = jnp.zeros((1, _LANES), jnp.int32)
        jax.lax.fori_loop(0, n_samples, step, (zero, zero, zrow))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("model", "n_samples", "temperature",
                     "parity_sampling", "interpret"),
)
def pallas_generate(
    model: WaveNet,
    variables,
    prompt_codes: jnp.ndarray,     # (1, >=RF) int32
    n_samples: int,
    temperature: float = 0.0,
    seed: int = 0,
    parity_sampling: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Generate (1, n_samples) mu-law codes with the VMEM-resident
    kernel.  See module docstring for restrictions."""
    rf = model.receptive_fields
    if n_samples <= rf:
        raise ValueError(f"n_samples ({n_samples}) must exceed RF ({rf})")
    if prompt_codes.shape[0] != 1:
        raise ValueError("pallas sampler is specialized to batch=1; "
                         "use fast_generate for batched generation")

    dil = model.dilations
    sum_d = int(np.sum(dil))
    c_in, r, s = (model.input_channels, model.residual_channels,
                  model.skip_channels)

    sp = stack_sampler_params(model, variables)
    prompt = prompt_codes[0, :rf].astype(jnp.int32)
    rf_pad = -(-rf // _LANES) * _LANES
    prompt = jnp.pad(prompt, (0, rf_pad - rf)).reshape(-1, _LANES)
    out_rows = -(-n_samples // _LANES)
    seed_arr = jnp.asarray([seed], jnp.int32)

    kernel = _make_kernel(dil, rf, n_samples, c_in, r, s,
                          float(temperature), parity_sampling)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, _LANES), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            *([vmem] * 10),                          # prompt + params
        ],
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((sum_d, r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed_arr, prompt,
      sp["front_cur"], sp["front_past"], sp["w_fg"], sp["w_out"],
      sp["b_out"], sp["h1_w"], sp["h1_b"], sp["h2_w"], sp["h2_b"])
    return out.reshape(1, out_rows * _LANES)[:, :n_samples]
