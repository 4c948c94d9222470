"""Autoregressive audio generation.

The reference's sampler (wavenet.py:193-239) re-runs a FULL forward pass
over an RF-length window for every generated sample from a Python loop —
O(T * RF * layers) work plus per-step framework overhead.  That loop is
the headline inefficiency this framework removes.

``fast_generate`` is a fast-wavenet cached sampler: each layer keeps a
ring buffer of its last ``dilation`` activations, so one generated
sample costs one small matvec per layer — O(T * layers) total — and the
whole loop runs on-device inside ``lax.scan`` (a single compiled XLA
while-loop, no host round-trips).

Zero-initialized ring buffers make the incremental computation exactly
the left-zero-padded full-length forward pass (models/wavenet.py), so
teacher-forced incremental logits equal the parallel forward's logits at
every position — the property the parity tests pin down.

Sampling parity: the reference's temperature path divides *softmax
probabilities* by the temperature and re-softmaxes before multinomial
(wavenet.py:227-233, a double-softmax quirk).  ``parity_sampling=True``
reproduces it; ``False`` samples the standard softmax(logits/T).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from movenet_tpu.models.wavenet import WaveNet


class _Layer(NamedTuple):
    dilation: int
    w_cur: Any
    w_past: Any
    ctx_kernel: Any   # or None
    ctx_bias: Any
    glob_kernel: Any  # or None
    res_kernel: Any
    res_bias: Any
    skip_kernel: Any
    skip_bias: Any


class _Net(NamedTuple):
    front_cur: Any
    front_past: Any
    layers: tuple
    head1_kernel: Any
    head1_bias: Any
    head2_kernel: Any
    head2_bias: Any


def _extract(model: WaveNet, variables) -> _Net:
    p = variables["params"] if "params" in variables else variables
    has_glob = "blocks_global_kernel" in p
    has_ctx = "blocks_ctx_kernel" in p
    layers = []
    for i, d in enumerate(model.dilations):
        layers.append(_Layer(
            dilation=d,
            w_cur=p["blocks_w_cur"][i],
            w_past=p["blocks_w_past"][i],
            ctx_kernel=p["blocks_ctx_kernel"][i] if has_ctx else None,
            ctx_bias=p["blocks_ctx_bias"][i] if has_ctx else None,
            glob_kernel=(p["blocks_global_kernel"][i]
                         if has_glob else None),
            res_kernel=p["blocks_res_kernel"][i],
            res_bias=p["blocks_res_bias"][i],
            skip_kernel=p["blocks_skip_kernel"][i],
            skip_bias=p["blocks_skip_bias"][i],
        ))
    return _Net(
        front_cur=p["front_cur"],
        front_past=p["front_past"],
        layers=tuple(layers),
        head1_kernel=p["head1"]["kernel"],
        head1_bias=p["head1"]["bias"],
        head2_kernel=p["head2"]["kernel"],
        head2_bias=p["head2"]["bias"],
    )


def _mm(a, b):
    # tiny latency-bound matvecs: full fp32 precision is free and keeps
    # greedy decoding deterministic across sampler implementations
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


def _step_logits(net: _Net, buffers, t, code_t, prev_code,
                 ctx_t: Optional[jnp.ndarray],
                 g_fg: Optional[tuple] = None):
    """One incremental step: consume code_t at position t, return
    (new_buffers, logits (B, C) predicting position t+1).  g_fg is an
    optional per-layer tuple of (B, 2R) global-conditioning shifts."""
    h = jnp.take(net.front_cur, code_t, axis=0)
    h = h + jnp.take(net.front_past, prev_code, axis=0) * (t > 0)

    skip_sum = None
    new_buffers = []
    for li, (l, buf) in enumerate(zip(net.layers, buffers)):
        slot = jax.lax.rem(t, l.dilation)
        past = jax.lax.dynamic_index_in_dim(buf, slot, axis=1,
                                            keepdims=False)  # (B, R)
        fg = _mm(h, l.w_cur) + _mm(past, l.w_past)
        if ctx_t is not None and l.ctx_kernel is not None:
            fg = fg + _mm(ctx_t, l.ctx_kernel) + l.ctx_bias
        if g_fg is not None:
            fg = fg + g_fg[li]
        f, g = jnp.split(fg, 2, axis=-1)
        gated = jnp.tanh(f) * jax.nn.sigmoid(g)
        skip = _mm(gated, l.skip_kernel) + l.skip_bias
        skip_sum = skip if skip_sum is None else skip_sum + skip
        new_buffers.append(
            jax.lax.dynamic_update_index_in_dim(buf, h, slot, axis=1))
        h = _mm(gated, l.res_kernel) + l.res_bias + h

    y = _mm(jax.nn.leaky_relu(skip_sum), net.head1_kernel) + net.head1_bias
    logits = _mm(jax.nn.leaky_relu(y), net.head2_kernel) + net.head2_bias
    return tuple(new_buffers), logits


def _init_buffers(model: WaveNet, batch: int, dtype=jnp.float32):
    r = model.residual_channels
    return tuple(
        jnp.zeros((batch, d, r), dtype) for d in model.dilations
    )


def _sample(logits, rng, temperature: float, parity_sampling: bool):
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    if parity_sampling:
        # reference: softmax(forward-softmax / T) then multinomial
        probs = jax.nn.softmax(logits, axis=-1)
        return jax.random.categorical(rng, probs / temperature, axis=-1)
    return jax.random.categorical(rng, logits / temperature, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "n_samples", "temperature", "parity_sampling",
        "warm_start"),
)
def fast_generate(
    model: WaveNet,
    variables,
    prompt_codes: jnp.ndarray,          # (B, >=RF) int32 mu-law codes
    n_samples: int,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    video: Optional[jnp.ndarray] = None,
    parity_sampling: bool = True,
    warm_start: bool = True,
    labels: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Generate ``n_samples`` total samples (first RF seeded from the
    prompt, as the reference does, wavenet.py:208-213).

    ``labels`` (B,) int class ids enable global (category) conditioning
    when the model was built with global_classes > 0.

    warm_start=True initializes the ring buffers with ONE parallel
    forward over the prompt (WaveNet.prompt_state) and starts the
    sequential loop at t=RF — skipping RF incremental steps.  Output is
    identical to the cold-start loop (same fp32 dot products, same
    per-step RNG keys).

    Returns int32 codes of shape (B, n_samples).
    """
    rf = model.receptive_fields
    if n_samples <= rf:
        raise ValueError(f"n_samples ({n_samples}) must exceed RF ({rf})")
    batch = prompt_codes.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    net = _extract(model, variables)
    ctx = None
    if video is not None:
        ctx = model.apply(variables, video, method=WaveNet.encode_video)
        ctx = ctx.astype(jnp.float32)
    global_vec = None
    g_fg = None
    if labels is not None and model.global_classes:
        global_vec = model.apply(variables, labels,
                                 method=WaveNet.embed_global)
        global_vec = global_vec.astype(jnp.float32)
        # per-layer global shifts are time-invariant: precompute once
        g_fg = tuple(_mm(global_vec, l.glob_kernel) for l in net.layers)

    prompt = prompt_codes[:, :rf].astype(jnp.int32)

    def step(carry, t):
        buffers, code_prev, code_cur = carry
        # input at position t: prompt inside the seed region, else the
        # sample emitted at step t-1 (already in code_cur)
        in_prompt = t < rf
        prompt_t = jax.lax.dynamic_index_in_dim(
            prompt, jnp.minimum(t, rf - 1), axis=1, keepdims=False)
        code_t = jnp.where(in_prompt, prompt_t, code_cur)
        ctx_t = None
        if ctx is not None:
            ctx_t = jax.lax.dynamic_index_in_dim(
                ctx, jnp.minimum(t, ctx.shape[1] - 1), axis=1,
                keepdims=False)
        buffers, logits = _step_logits(
            net, buffers, t, code_t, code_prev, ctx_t, g_fg)
        nxt = _sample(logits, jax.random.fold_in(rng, t),
                      temperature, parity_sampling)
        return (buffers, code_t, nxt.astype(jnp.int32)), code_t

    if warm_start:
        ctx_prompt = None if ctx is None else ctx[:, :rf]
        buffers, last_logits = model.apply(
            variables, prompt, ctx_prompt, global_vec,
            method=WaveNet.prompt_state)
        first = _sample(last_logits, jax.random.fold_in(rng, rf - 1),
                        temperature, parity_sampling).astype(jnp.int32)
        carry = (tuple(buffers), prompt[:, -1], first)
        carry, codes_t = jax.lax.scan(
            step, carry, jnp.arange(rf, n_samples, dtype=jnp.int32))
        gen = jnp.swapaxes(codes_t, 0, 1)      # (B, n - rf)
        return jnp.concatenate([prompt, gen], axis=1)

    buffers = _init_buffers(model, batch)
    zero = jnp.zeros((batch,), jnp.int32)
    carry = (buffers, zero, zero)
    carry, codes_t = jax.lax.scan(
        step, carry, jnp.arange(n_samples, dtype=jnp.int32))
    # codes_t[t] is the code consumed at position t; append nothing —
    # positions 0..n_samples-1 are exactly the generated sequence.
    return jnp.swapaxes(codes_t, 0, 1)  # (B, n_samples)


@functools.partial(jax.jit, static_argnames=("model",))
def incremental_logits(model: WaveNet, variables,
                       codes: jnp.ndarray,
                       video: Optional[jnp.ndarray] = None,
                       labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Teacher-forced incremental forward: returns full-length logits
    (B, T, C) that must equal the parallel ``backbone`` logits —
    the golden equivalence test for the cached sampler."""
    net = _extract(model, variables)
    batch, total = codes.shape
    ctx = None
    if video is not None:
        ctx = model.apply(variables, video, method=WaveNet.encode_video)
        ctx = ctx.astype(jnp.float32)
    g_fg = None
    if labels is not None and model.global_classes:
        gv = model.apply(variables, labels,
                         method=WaveNet.embed_global).astype(jnp.float32)
        g_fg = tuple(_mm(gv, l.glob_kernel) for l in net.layers)

    def step(carry, t):
        buffers, prev = carry
        code_t = jax.lax.dynamic_index_in_dim(codes, t, axis=1,
                                              keepdims=False)
        ctx_t = None
        if ctx is not None:
            ctx_t = jax.lax.dynamic_index_in_dim(ctx, t, axis=1,
                                                 keepdims=False)
        buffers, logits = _step_logits(net, buffers, t, code_t, prev,
                                       ctx_t, g_fg)
        return (buffers, code_t), logits

    carry = (_init_buffers(model, batch),
             jnp.zeros((batch,), jnp.int32))
    _, logits = jax.lax.scan(step, carry,
                             jnp.arange(total, dtype=jnp.int32))
    return jnp.swapaxes(logits, 0, 1)  # (B, T, C)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "n_samples", "temperature", "parity_sampling"),
)
def naive_generate(
    model: WaveNet,
    variables,
    prompt_codes: jnp.ndarray,
    n_samples: int,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    parity_sampling: bool = True,
) -> jnp.ndarray:
    """The reference's O(T * RF) algorithm (wavenet.py:217-237): a full
    RF-window forward per generated sample.  Kept as the apples-to-apples
    performance baseline for bench.py and as a cross-check oracle for
    ``fast_generate`` (audio-only; the reference's video path cannot run,
    see models/wavenet.py docstring)."""
    rf = model.receptive_fields
    batch = prompt_codes.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    codes = jnp.zeros((batch, n_samples), jnp.int32)
    codes = codes.at[:, :rf].set(prompt_codes[:, :rf].astype(jnp.int32))

    def step(codes, i):
        window = jax.lax.dynamic_slice_in_dim(codes, i - rf, rf, axis=1)
        logits = model.apply(
            variables, window, output_unnormalized=False,
            remove_last=False)                 # (B, C, 1)
        logits = logits[:, :, -1]
        nxt = _sample(logits, jax.random.fold_in(rng, i),
                      temperature, parity_sampling)
        codes = jax.lax.dynamic_update_index_in_dim(
            codes, nxt.astype(jnp.int32), i, axis=1)
        return codes, None

    codes, _ = jax.lax.scan(
        step, codes, jnp.arange(rf, n_samples, dtype=jnp.int32))
    return codes
