"""Video-conditioned WaveNet, TPU-native.

Functional parity target: the reference model (wavenet.py:50-191,
modules.py:15-142) — a causal conv front-end, a stack of gated dilated
residual blocks with per-layer video conditioning, and a 1x1-conv output
head, trained on mu-law one-hot audio.

TPU-first differences (behavior-preserving, see ops/conv.py docstring):

  * every size-2 (dilated) causal conv is two dense matmuls + a time
    shift; 1x1 convs are plain matmuls; the Conv3d video front-end is a
    4096->C projection; the stride-10 ConvTranspose1d upsamplers are
    C->10*C matmuls + reshape.  All FLOPs land on the MXU.
  * activations keep a single static (B, T, C) shape through the whole
    stack (left-zero-pad causal semantics); the final output is sliced
    to the last ``T - RF + 1`` positions, which is numerically identical
    to the reference's shrinking valid-conv pipeline.
  * the filter and gate convs of each block (and their context convs)
    are fused into one (C, 2C) matmul each.

Intentional behavioral divergence: the reference's video-conditioned
forward pass crashes at HEAD (modules.py:76-77 adds a full-length
context to a dilation-shrunk activation — length mismatch), so there is
no working upstream semantics to preserve.  Here conditioning is
defined the natural way: the upsampled context feature at absolute time
``t`` modulates the block computation at time ``t``.

Parity quirk preserved: ``__call__`` returns *softmax probabilities*
when ``output_unnormalized=True`` (the reference's inverted-name default,
wavenet.py:189-191); the trainer computes cross-entropy on those
probabilities when ``parity_softmax_output`` is set.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

def _mm_precision(dtype):
    """Full fp32 MXU precision in parity (float32) mode; default
    (bf16 passes) otherwise."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


from movenet_tpu.ops.conv import (
    causal_pad_shift,
    receptive_field,
    upsample_kernel_size,
    wavenet_dilations,
)

MAX_AUDIO_FRAMES = 160_000
MAX_VIDEO_FRAMES = 160
VIDEO_FRAME_HW = (64, 64)
UPSAMPLE_STRIDE = 10


def video_upsample_sizes(in_frames: int = MAX_VIDEO_FRAMES,
                         out_frames: int = MAX_AUDIO_FRAMES
                         ) -> Sequence[int]:
    """Geometric upsampling schedule 160 -> 1600 -> 16000 -> 160000
    (reference: wavenet.py:100-106, same geomspace construction)."""
    num = math.ceil(np.log10(out_frames / in_frames) + 1)
    return [int(s) for s in np.geomspace(in_frames, out_frames, num=num)]


class VideoEncoder(nn.Module):
    """Video (B, F, H, W, C) -> local conditioning features (B, T_audio, R).

    Equivalent computation to the reference's ``Conv3d(1, R, (1, 64, 64))``
    + chain of ``ConvTranspose1d(R, R, k=10, s=10)`` (wavenet.py:94-118,
    149-156), expressed as dense projections:

      * the (1, 64, 64)-kernel Conv3d touches each frame exactly once at
        full spatial extent, i.e. it is a (H*W*C -> R) affine map per frame;
      * a stride-10 kernel-10 transposed conv has non-overlapping output
        windows, i.e. it is an (R -> 10*R) affine map per input step,
        reshaped to 10 output steps.
    """

    residual_channels: int
    in_frames: int = MAX_VIDEO_FRAMES
    out_frames: int = MAX_AUDIO_FRAMES
    context_in_channels: int = 1
    frame_hw: tuple = VIDEO_FRAME_HW
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray,
                 coarse: bool = False) -> jnp.ndarray:
        """``coarse=True`` stops BEFORE the final stride-10 dense
        upsample and returns the (B, T/10, R) pre-upsample features —
        the fused train path folds that last stage's backward into the
        trunk kernel (ops/pallas/stack_kernel ctx_proj).  When the
        final stage is not the non-overlapping dense case, the full
        (B, T, R) output is returned instead (callers detect by
        shape)."""
        b, f = video.shape[0], video.shape[1]
        r = self.residual_channels
        x = video.reshape(b, f, -1).astype(self.compute_dtype)
        prec = _mm_precision(self.compute_dtype)
        x = nn.Dense(r, dtype=self.compute_dtype, precision=prec,
                     name="frame_proj")(x)

        sizes = video_upsample_sizes(self.in_frames, self.out_frames)
        n_stages = len(sizes) - 1
        for i, (s_in, s_out) in enumerate(zip(sizes[:-1], sizes[1:])):
            k = upsample_kernel_size(s_in, s_out, stride=UPSAMPLE_STRIDE)
            if coarse and i == n_stages - 1 and k == UPSAMPLE_STRIDE:
                return x                    # (B, T/10, R)
            if k == UPSAMPLE_STRIDE:
                # non-overlapping windows: pure matmul + reshape
                y = nn.Dense(k * r, dtype=self.compute_dtype, precision=prec,
                             name=f"upsample_{i}")(x)
                x = y.reshape(b, x.shape[1] * k, r)
            else:  # pragma: no cover - only hit for non-canonical shapes
                w = self.param(
                    f"upsample_{i}_kernel", nn.initializers.lecun_normal(),
                    (k, r, r), jnp.float32)
                bias = self.param(
                    f"upsample_{i}_bias", nn.initializers.zeros, (r,),
                    jnp.float32)
                x = jax.lax.conv_transpose(
                    x.astype(self.compute_dtype),
                    w.astype(self.compute_dtype),
                    strides=(UPSAMPLE_STRIDE,), padding="VALID",
                    dimension_numbers=("NTC", "TIO", "NTC"),
                ) + bias.astype(self.compute_dtype)
                x = x[:, :s_out]
        return x  # (B, out_frames, R)


class WaveNet(nn.Module):
    """WaveNet with local (video) conditioning.

    Public call surface mirrors the reference (wavenet.py:158-191):
    ``model.apply(params, audio, video, output_unnormalized, remove_last)``
    with audio as (B, C, T) one-hot/probability mass and output as
    (B, C, T') — T' = T - RF + 1 (or T - RF with ``remove_last``).

    Additionally accepts integer mu-law codes of shape (B, T): the input
    layer then becomes an embedding gather instead of a one-hot matmul
    (the TPU-native hot path; numerically identical).
    """

    layer_size: int
    stack_size: int
    input_channels: int
    residual_channels: int = 16
    skip_channels: int = 16
    context_in_channels: int = 1
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # fused-trunk VJP strategy override (None -> auto/remat rules)
    fused_strategy: Optional[str] = None
    max_audio_frames: int = MAX_AUDIO_FRAMES
    max_video_frames: int = MAX_VIDEO_FRAMES
    global_classes: int = 0
    # video (local) conditioning: when False, the per-block context
    # convs are not created at all — a context-free model otherwise
    # carries L*R*2R dead parameters that still receive optimizer
    # state and (AdamW) weight decay
    use_context: bool = True

    @property
    def dilations(self):
        return wavenet_dilations(self.layer_size, self.stack_size)

    @property
    def receptive_fields(self) -> int:
        return receptive_field(self.layer_size, self.stack_size)

    def setup(self):
        r = self.residual_channels
        init = nn.initializers.lecun_normal()
        # front-end causal conv (k=2, no bias; reference modules.py:15-30)
        self.front_cur = self.param(
            "front_cur", init, (self.input_channels, r), jnp.float32)
        self.front_past = self.param(
            "front_past", init, (self.input_channels, r), jnp.float32)

        # gated residual blocks as STACKED (L, ...) parameter arrays
        # instead of L per-block submodules: the WaveNet tree would
        # otherwise hold ~10 tiny leaves PER LAYER, and every train
        # step pays ~100 small-kernel launches to pack them for the
        # fused kernels, split the stacked gradients back, and run the
        # per-leaf optimizer/ravel arithmetic (~1 ms/step on v5e).
        # The fused kernels and samplers consume exactly this layout.
        n_layers = len(self.dilations)
        binit = jax.nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
            batch_axis=(0,))  # per-layer lecun_normal statistics
        zeros = nn.initializers.zeros
        self.blocks_w_cur = self.param(
            "blocks_w_cur", binit, (n_layers, r, 2 * r), jnp.float32)
        self.blocks_w_past = self.param(
            "blocks_w_past", binit, (n_layers, r, 2 * r), jnp.float32)
        # context filter+gate 1x1 convs (with bias, like the reference's
        # modules.py:58-63); gated on use_context (mirrors the
        # global_classes gate below)
        if self.use_context:
            self.blocks_ctx_kernel = self.param(
                "blocks_ctx_kernel", binit, (n_layers, r, 2 * r),
                jnp.float32)
            self.blocks_ctx_bias = self.param(
                "blocks_ctx_bias", zeros, (n_layers, 2 * r),
                jnp.float32)
        else:
            self.blocks_ctx_kernel = None
            self.blocks_ctx_bias = None
        self.blocks_res_kernel = self.param(
            "blocks_res_kernel", binit, (n_layers, r, r), jnp.float32)
        self.blocks_res_bias = self.param(
            "blocks_res_bias", zeros, (n_layers, r), jnp.float32)
        self.blocks_skip_kernel = self.param(
            "blocks_skip_kernel", binit,
            (n_layers, r, self.skip_channels), jnp.float32)
        self.blocks_skip_bias = self.param(
            "blocks_skip_bias", zeros, (n_layers, self.skip_channels),
            jnp.float32)
        if self.global_classes:
            self.blocks_global_kernel = self.param(
                "blocks_global_kernel", binit, (n_layers, r, 2 * r),
                jnp.float32)
        # output head (reference DenseConv, modules.py:133-142)
        self.head1 = nn.Dense(self.input_channels, dtype=self.compute_dtype,
                              precision=_mm_precision(self.compute_dtype),
                              name="head1")
        self.head2 = nn.Dense(self.input_channels, dtype=self.compute_dtype,
                              precision=_mm_precision(self.compute_dtype),
                              name="head2")
        if self.global_classes:
            self.global_embed = nn.Embed(
                self.global_classes, r, name="global_embed")
        self.video_encoder = VideoEncoder(
            residual_channels=r,
            in_frames=self.max_video_frames,
            out_frames=self.max_audio_frames,
            context_in_channels=self.context_in_channels,
            compute_dtype=self.compute_dtype,
            name="video_encoder",
        )

    def _front(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Input layer. (B, T) int codes or (B, C, T) float mass ->
        (B, T, R)."""
        dt = self.compute_dtype
        if audio.ndim == 2 and jnp.issubdtype(audio.dtype, jnp.integer):
            w_cur = self.front_cur.astype(dt)
            w_past = self.front_past.astype(dt)
            cur = jnp.take(w_cur, audio, axis=0)           # (B, T, R)
            prev = jnp.take(w_past, audio, axis=0)
            # x[t-1] tap; t=0 sees zero-pad (one-hot of nothing = zeros)
            past = jnp.pad(prev, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
            return cur + past
        if audio.ndim != 3:
            raise ValueError(
                "audio must be (B, T) int codes or (B, C, T) float mass, "
                f"got shape {audio.shape}")
        x = jnp.swapaxes(audio, 1, 2).astype(dt)           # (B, T, C)
        prec = _mm_precision(dt)
        cur = jnp.einsum("btc,cr->btr", x, self.front_cur.astype(dt),
                         precision=prec, preferred_element_type=dt)
        past = jnp.einsum("btc,cr->btr", causal_pad_shift(x, 1),
                          self.front_past.astype(dt),
                          precision=prec, preferred_element_type=dt)
        return cur + past

    def encode_video(self, video: jnp.ndarray) -> jnp.ndarray:
        """Video (B, F, H, W, C) -> (B, T_audio, R) conditioning features
        (reference upsample_video, wavenet.py:149-156)."""
        return self.video_encoder(video)

    def encode_video_coarse(self, video: jnp.ndarray) -> jnp.ndarray:
        """Video -> (B, T_audio/10, R) features BEFORE the final
        stride-10 upsample (falls back to the full-rate output when the
        final stage is not the dense non-overlapping case; callers
        detect by shape).  Used by the fused train path to fold the
        last upsample into the trunk kernels."""
        return self.video_encoder(video, coarse=True)

    def embed_global(self, labels: Optional[jnp.ndarray]
                     ) -> Optional[jnp.ndarray]:
        """(B,) int class ids -> (B, R) global conditioning vector, or
        None when global conditioning is disabled/absent."""
        if labels is None or not self.global_classes:
            return None
        return self.global_embed(labels.astype(jnp.int32))

    def apply_block(self, l: int, x: jnp.ndarray,
                    context: Optional[jnp.ndarray],
                    global_vec: Optional[jnp.ndarray] = None):
        """One gated residual block from the stacked parameters
        (reference modules.py:49-93): (residual, skip)."""
        dt = self.compute_dtype
        prec = _mm_precision(dt)
        gk = None
        if global_vec is not None and self.global_classes:
            gk = self.blocks_global_kernel[l]
        ck = cb = None
        if context is not None:
            if self.blocks_ctx_kernel is None:
                raise ValueError(
                    "model was built with use_context=False but a "
                    "video context was provided")
            ck = self.blocks_ctx_kernel[l]
            cb = self.blocks_ctx_bias[l]
        args = (self.blocks_w_cur[l], self.blocks_w_past[l],
                ck, cb, gk,
                self.blocks_res_kernel[l], self.blocks_res_bias[l],
                self.blocks_skip_kernel[l], self.blocks_skip_bias[l])

        def dense(x, kernel, bias=None):
            # exactly nn.Dense's contraction (bitwise: the fused-vs-
            # unfused equivalence tests compare at near-bitwise
            # tolerance and einsum can lower differently)
            y = jax.lax.dot_general(
                x.astype(dt), kernel.astype(dt),
                (((x.ndim - 1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=dt)
            if bias is not None:
                y = y + bias.astype(dt)
            return y

        def block(x, context, global_vec, *w):
            (w_cur, w_past, ck, cb, gk, rk, rb, sk, sb) = w
            fg = jnp.einsum("btc,co->bto", x, w_cur.astype(dt),
                            precision=prec, preferred_element_type=dt)
            fg += jnp.einsum("btc,co->bto",
                             causal_pad_shift(x, self.dilations[l]),
                             w_past.astype(dt), precision=prec,
                             preferred_element_type=dt)
            if context is not None:
                fg += dense(context, ck, cb)
            if gk is not None:
                fg += dense(global_vec, gk)[:, None, :]
            f, g = jnp.split(fg, 2, axis=-1)
            gated = jnp.tanh(f) * jax.nn.sigmoid(g)
            residual = dense(gated, rk, rb) + x
            skip = dense(gated, sk, sb)
            return residual, skip

        if self.remat:
            block = jax.checkpoint(block)
        return block(x, context, global_vec, *args)

    def backbone(self, audio: jnp.ndarray,
                 context_features: Optional[jnp.ndarray],
                 global_vec: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Shared trunk: input layer + gated stack + head.

        Returns full-length logits (B, T, C); position ``t`` is the
        model's prediction for sample ``t + 1``.  Only positions
        ``>= RF - 1`` carry a full receptive field.
        """
        h = self._front(audio)
        skip_sum = None
        for l in range(len(self.dilations)):
            h, skip = self.apply_block(l, h, context_features,
                                       global_vec)
            skip_sum = skip if skip_sum is None else skip_sum + skip
        # head on full length; 1x1 ops commute with the final time slice
        y = self.head1(nn.leaky_relu(skip_sum))
        logits = self.head2(nn.leaky_relu(y))
        return logits  # (B, T, C)

    def __call__(
        self,
        audio: jnp.ndarray,
        video: Optional[jnp.ndarray] = None,
        global_features: Optional[jnp.ndarray] = None,  # (B,) class ids
        output_unnormalized: bool = True,
        remove_last: bool = True,
    ) -> jnp.ndarray:
        context = self.encode_video(video) if video is not None else None
        global_vec = self.embed_global(global_features)
        if context is not None:
            t_audio = audio.shape[-1] if audio.ndim == 3 else audio.shape[1]
            if context.shape[1] != t_audio:
                raise ValueError(
                    "expected upsampled video and audio to have equal time "
                    f"lengths, found {context.shape[1]}, {t_audio}")
        t_in = audio.shape[-1] if audio.ndim == 3 else audio.shape[1]
        self.compute_output_size(t_in)          # validates T > RF
        logits = self.backbone(audio, context, global_vec)
        rf = self.receptive_fields
        logits = logits[:, rf - 1:, :]          # valid region: T - RF + 1
        if remove_last:
            logits = logits[:, :-1, :]          # drop the targetless step
        out = jnp.swapaxes(logits, 1, 2)        # (B, C, T') parity layout
        out = out.astype(jnp.float32)
        if not output_unnormalized:
            return out
        # NOTE: inverted naming preserved from the reference
        # (wavenet.py:189-191): the DEFAULT returns softmax probabilities.
        return jax.nn.softmax(out, axis=1)

    def train_logits(self, audio: jnp.ndarray,
                     video: Optional[jnp.ndarray] = None,
                     labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Training hot path: time-major logits aligned with targets.

        Returns (B, T - RF, C) float logits where position ``i``
        predicts ``codes[:, RF + i]`` — exactly the reference's
        ``forward(...)`` + ``remove_last`` slice (wavenet.py:183-187)
        without the (B, C, T) transpose or the softmax quirk (the loss
        applies that, movenet_tpu.train.loop).
        """
        context = self.encode_video(video) if video is not None else None
        t_in = audio.shape[-1] if audio.ndim == 3 else audio.shape[1]
        if context is not None and context.shape[1] != t_in:
            raise ValueError(
                "expected upsampled video and audio to have equal time "
                f"lengths, found {context.shape[1]}, {t_in}")
        self.compute_output_size(t_in)
        logits = self.backbone(audio, context, self.embed_global(labels))
        return logits[:, self.receptive_fields - 1:-1, :]

    def prompt_state(self, audio: jnp.ndarray,
                     context: Optional[jnp.ndarray] = None,
                     global_vec: Optional[jnp.ndarray] = None):
        """One parallel pass over a prompt, returning the cached-sampler
        warm-start state: per-layer ring-buffer contents and the logits
        at the final position.

        For layer l (dilation d), the incremental sampler needs the
        layer INPUT h_l[t] for t in [T-d, T) — exactly the intermediate
        activations of the parallel forward.  Returns
        (buffers, last_logits) where buffers[l] is (B, d, R) laid out in
        ring order (slot = t mod d) and last_logits is (B, C) predicting
        position T.
        """
        t_total = audio.shape[-1] if audio.ndim == 3 else audio.shape[1]
        h = self._front(audio)
        buffers = []
        skip_sum = None
        for l, d in enumerate(self.dilations):
            tail = h[:, t_total - d:, :].astype(jnp.float32)
            # ring layout: slot of time t is t mod d; tail index i holds
            # time T-d+i  ->  slot (T+i) mod d
            slots = (jnp.arange(d) - t_total) % d
            buffers.append(jnp.take(tail, slots, axis=1))
            h, skip = self.apply_block(l, h, context, global_vec)
            skip_sum = skip if skip_sum is None else skip_sum + skip
        y = self.head1(nn.leaky_relu(skip_sum))
        logits = self.head2(nn.leaky_relu(y))
        return buffers, logits[:, -1, :].astype(jnp.float32)

    def init_all(self, audio: jnp.ndarray,
                 video: Optional[jnp.ndarray] = None,
                 labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Initialization-only entry point: touches every submodule
        (video encoder included) regardless of audio/context length, so
        ``model.init(rng, audio, video, method=WaveNet.init_all)`` builds
        the complete parameter tree even for truncated debug shapes."""
        ctx = None
        if video is not None:
            ctx = self.encode_video(video)
            t = audio.shape[-1] if audio.ndim == 3 else audio.shape[1]
            ctx = ctx[:, :t]
        if labels is None and self.global_classes:
            labels = jnp.zeros((audio.shape[0],), jnp.int32)
        return self.backbone(audio, ctx, self.embed_global(labels))

    def compute_output_size(self, time_steps: int) -> int:
        out = time_steps - self.receptive_fields + 1
        if out < 1:
            raise ValueError(
                "input time steps must be larger than the number of "
                f"receptive fields. Number of input timesteps = "
                f"{time_steps}, receptive fields = {self.receptive_fields}")
        return out


def block_param_view(params, i: int) -> dict:
    """Old per-block dict view over the stacked block parameters
    (read-only; for tests/tools that port weights layer by layer)."""
    out = {
        "w_cur": params["blocks_w_cur"][i],
        "w_past": params["blocks_w_past"][i],
        "residual_proj": {"kernel": params["blocks_res_kernel"][i],
                          "bias": params["blocks_res_bias"][i]},
        "skip_proj": {"kernel": params["blocks_skip_kernel"][i],
                      "bias": params["blocks_skip_bias"][i]},
    }
    if "blocks_ctx_kernel" in params:
        out["context_proj"] = {"kernel": params["blocks_ctx_kernel"][i],
                               "bias": params["blocks_ctx_bias"][i]}
    if "blocks_global_kernel" in params:
        out["global_proj"] = {
            "kernel": params["blocks_global_kernel"][i]}
    return out


def make_wavenet(model_config, compute_dtype=None) -> WaveNet:
    """Build a WaveNet from a ModelConfig (movenet_tpu.config)."""
    dt = compute_dtype
    if dt is None:
        dt = jnp.bfloat16 if model_config.compute_dtype == "bfloat16" \
            else jnp.float32
    return WaveNet(
        layer_size=model_config.layer_size,
        stack_size=model_config.stack_size,
        input_channels=model_config.input_channels,
        residual_channels=model_config.residual_channels,
        skip_channels=model_config.skip_channels,
        context_in_channels=model_config.context_in_channels,
        compute_dtype=dt,
        remat=model_config.remat,
        fused_strategy=getattr(model_config, "fused_strategy", None),
        max_audio_frames=model_config.max_audio_frames,
        max_video_frames=model_config.max_video_frames,
        global_classes=model_config.global_classes,
        use_context=getattr(model_config, "use_context", True),
    )
