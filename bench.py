"""Headline benchmark: autoregressive 16 kHz mu-law generation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = samples/sec/chip of the VMEM-resident Pallas sampler
               kernel in short-critical-path mode (fast=True,
               movenet_tpu.ops.pallas.ar_sampler) on the flagship
               config (layer=10, stack=3, 256 channels, RF=3072 — the
               reference's tested generation config,
               tests/test_model.py:42-48).  The bit-exact kernel's rate
               is "exact_kernel_samples_per_sec" (greedy agreement
               between the two is also reported); the lax.scan
               sampler's rate is "scan_sampler_samples_per_sec".
vs_baseline  = speedup over the reference's PyTorch sampler
               (wavenet.py:193-239: a Python loop running a full
               RF-window forward per sample), measured at 20.9
               samples/sec on this image's host CPU with the reference
               model at the same flagship config (layer=10, stack=3,
               256/64/64, RF=3072, torch 2.x, greedy) — see
               BENCH_NOTES.md for the measurement protocol.
               "vs_naive_same_chip" additionally reports the speedup
               over the same naive ALGORITHM reimplemented in JAX and
               timed on the same TPU chip (a much stronger baseline).
"""

# measured once against /root/reference's sampler on this host (see
# module docstring); the reference publishes no numbers of its own
REFERENCE_TORCH_SAMPLES_PER_SEC = 20.9

import json
import time

import numpy as np


# v5e peaks for the roofline/MFU report (public spec: 394 bf16
# TFLOP/s, 819 GB/s HBM per chip)
V5E_PEAK_TFLOPS = 394.0
V5E_PEAK_HBM_GBS = 819.0


def _breakdancing_setup():
    import jax
    import jax.numpy as jnp

    from movenet_tpu.config import MeshConfig, ModelConfig, TrainingConfig
    from movenet_tpu.models.wavenet import make_wavenet
    from movenet_tpu.train import create_train_state, make_optimizer, \
        make_train_step
    from movenet_tpu.train.loop import Batch

    mc = ModelConfig(layer_size=3, stack_size=3, input_channels=64,
                     residual_channels=64, skip_channels=64,
                     compute_dtype="bfloat16")
    cfg = TrainingConfig(model_config=mc, optimizer="AdamW",
                         learning_rate=3e-4, scheduler=None,
                         batch_size=2, fused_blocks=True,
                         mesh=MeshConfig(data=1, seq=1))
    model = make_wavenet(mc)
    rng = np.random.default_rng(0)
    batch = Batch(
        codes=jnp.asarray(rng.integers(0, 64, size=(2, 160_000)),
                          jnp.int32),
        video=jnp.asarray(rng.standard_normal((2, 160, 64, 64, 1)),
                          jnp.float32))
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0),
                               batch)
    return model, cfg, state, batch


def _train_step_model_flops(mc, b, t):
    """Analytic matmul FLOPs of one fused train step (trunk fwd + bwd,
    head fwd + bwd, embedding backward; video encoder and optimizer
    excluded — both sub-1% here)."""
    L = mc.layer_size * mc.stack_size
    r, s, c, rows = (mc.residual_channels, mc.skip_channels,
                     mc.input_channels, b * t)
    fg_k = 3 * r  # [h | shifted | ctx]
    fwd = L * rows * 2 * (fg_k * 2 * r + r * (r + s))
    # bwd per layer: dgated, dwfg, dwout, dfg_w (fg recompute is saved)
    bwd = L * rows * 2 * ((r + s) * r + fg_k * 2 * r + r * (r + s)
                          + 2 * r * fg_k)
    head = rows * 2 * (s * c + c * c)        # fwd
    head += rows * 2 * (2 * (s * c + c * c))  # bwd (dw + dx per matmul)
    embed_bwd = 2 * rows * 2 * (c * r)
    return fwd + bwd + head + embed_bwd


def _train_steps_per_sec():
    """Secondary metric (BASELINE.md): train steps/sec on the
    kinetics-breakdancing config (experiments/02: video-conditioned,
    layer=3 stack=3, 64/64 channels, batch 2, full 160k-sample clips),
    bf16 compute, single chip.  Returns (steps/s, scan8 steps/s,
    mfu_pct, flops): the first number dispatches one step per call
    (comparable across rounds; includes ~1 ms/call of tunnel dispatch),
    the second runs 8 steps per call via lax.scan
    (train.make_scan_train_step), the deployment pattern that
    amortizes host dispatch."""
    import jax
    import jax.numpy as jnp

    from movenet_tpu.train import make_scan_train_step, make_train_step

    model, cfg, state, batch = _breakdancing_setup()
    step = jax.jit(make_train_step(model, cfg))
    state, m = step(state, batch)
    np.asarray(m["loss"])  # compile + warm (full sync)
    reps = 32
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, batch)  # state-chained: serialized
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    flops = _train_step_model_flops(cfg.model_config, 2, 160_000)
    mfu = flops / dt / (V5E_PEAK_TFLOPS * 1e12) * 100

    # scan-of-8: one dispatch per 8 optimizer steps
    n_scan = 8
    scan_step = jax.jit(make_scan_train_step(model, cfg, n_scan))
    batches8 = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_scan,) + x.shape), batch)
    state, m = scan_step(state, batches8)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(reps // 4):
        state, m = scan_step(state, batches8)
    np.asarray(m["loss"])
    dt8 = (time.perf_counter() - t0) / (reps // 4) / n_scan
    return 1.0 / dt, 1.0 / dt8, mfu, flops


def _check_on_hardware():
    """On-TPU correctness gate (VERDICT round-1 item 4): the Pallas
    sampler must produce bit-identical greedy output to the lax.scan
    sampler on real Mosaic lowering (interpret-mode tests don't exercise
    that), and the fused training pipeline must match XLA's loss /
    grad-norm / accuracy.  Returns a dict that lands in the bench JSON.
    """
    import jax
    import jax.numpy as jnp

    from movenet_tpu.config import ModelConfig
    from movenet_tpu.models.sampler import fast_generate
    from movenet_tpu.models.wavenet import WaveNet, make_wavenet
    from movenet_tpu.ops.pallas.ar_sampler import pallas_generate

    results = {}
    ok = True

    cfg = ModelConfig(
        layer_size=10, stack_size=2, input_channels=256,
        residual_channels=64, skip_channels=64, compute_dtype="float32",
        max_audio_frames=4000, max_video_frames=4)
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    rng = np.random.default_rng(7)
    n_total = rf + 512
    for b, with_video in ((1, False), (8, False), (1, True)):
        prompt = jnp.asarray(rng.integers(0, 256, size=(b, rf)),
                             jnp.int32)
        video = None
        if with_video:
            video = jnp.asarray(
                rng.standard_normal((b, 4, 64, 64, 1)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               prompt, video, method=WaveNet.init_all)
        got = np.asarray(pallas_generate(
            model, variables, prompt, n_total, temperature=0.0,
            video=video))
        want = np.asarray(fast_generate(
            model, variables, prompt, n_total, temperature=0.0,
            video=video))
        key = f"sampler_b{b}{'_video' if with_video else ''}"
        match = bool((got == want).all())
        results[key] = "bit-equal" if match else (
            f"MISMATCH {(got != want).mean():.4f}")
        ok = ok and match

    # fused training pipeline vs XLA (bf16: tolerance, not bit-equal)
    from movenet_tpu.train import create_train_state, make_optimizer, \
        make_train_step

    model, cfg, state0, batch = _breakdancing_setup()
    import dataclasses
    vals = {}
    for fused in (False, True):
        c = dataclasses.replace(cfg, fused_blocks=fused)
        step = jax.jit(make_train_step(model, c))
        state = state0
        for _ in range(3):
            state, m = step(state, batch)
        vals[fused] = {k: float(m[k])
                       for k in ("loss", "grad_norm", "accuracy")}
    deltas = {k: abs(vals[True][k] - vals[False][k])
              for k in vals[True]}
    train_ok = all(d < 2e-3 for d in deltas.values())
    results["fused_train_vs_xla"] = {
        "deltas": {k: round(v, 8) for k, v in deltas.items()},
        "ok": train_ok}
    ok = ok and train_ok
    results["passed"] = ok
    return results


def main():
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache (best effort under remote compile)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from movenet_tpu.config import ModelConfig
    from movenet_tpu.models.sampler import fast_generate, naive_generate
    from movenet_tpu.models.wavenet import make_wavenet
    from movenet_tpu.ops.pallas.ar_sampler import pallas_generate

    cfg = ModelConfig(
        layer_size=10, stack_size=3, input_channels=256,
        residual_channels=64, skip_channels=64,
        compute_dtype="float32")
    model = make_wavenet(cfg)
    rf = model.receptive_fields  # 3072

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 256, size=(1, rf)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), prompt[:, : rf + 0])

    def timed(fn, reps=4):
        """Amortized per-call wall time.

        The tunneled PJRT backend here has a large fixed host<->device
        round-trip (~30 ms) and its block_until_ready can return early,
        so: force one full host transfer to warm/compile, then dispatch
        ``reps`` executions back-to-back (they serialize on the device
        queue) and transfer only the last result — one latency paid,
        divided across reps.
        """
        np.asarray(fn())  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    # --- Pallas VMEM-resident kernel --------------------------------------
    n_gen = 16_000  # one second of 16 kHz audio beyond the prompt
    n_total = rf + n_gen
    dt_pallas = timed(lambda: pallas_generate(
        model, variables, prompt, n_total, temperature=0.0))
    exact_rate = n_gen / dt_pallas

    # short-critical-path mode (headline): precomputed weight products
    # leave one dependent matmul per layer, single-pass MXU precision,
    # and packed-tanh gating (ar_sampler.py docstring) — fp-shifted, so
    # greedy agreement with the exact kernel is verified on a
    # SHARPENED-head model (x10 head2): an untrained random-weight
    # model at temperature 0 has near-uniform logits whose argmax flips
    # under any fp change and then diverges chaotically, which measures
    # tie-breaking, not correctness (tests/test_pallas_sampler.py uses
    # the same construction)
    dt_fast = timed(lambda: pallas_generate(
        model, variables, prompt, n_total, temperature=0.0, fast=True))
    fast_rate = n_gen / dt_fast
    sharp = {"params": dict(
        variables["params"],
        head2=dict(variables["params"]["head2"],
                   kernel=jnp.asarray(
                       variables["params"]["head2"]["kernel"]) * 10.0))}
    n_agree = 512  # one flipped near-tie diverges the whole suffix, so
    # a LONG-horizon fraction on random weights measures chaos, not
    # correctness; 512 steps with margin is the regime the CPU
    # equivalence test pins (the verify drive additionally shows
    # identical continuation MAE on a TRAINED model for all samplers)
    a = np.asarray(pallas_generate(
        model, sharp, prompt, rf + n_agree, temperature=0.0, fast=True))
    b = np.asarray(pallas_generate(
        model, sharp, prompt, rf + n_agree, temperature=0.0))
    fast_agree = float((a == b).mean())
    fast_first_div = (int(np.argmax(a[0] != b[0])) - rf
                      if (a != b).any() else n_agree)

    # --- batched kernel: aggregate chip throughput at B=8 (fast mode,
    # like the generate CLI default) ----------------------------------------
    prompt8 = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, size=(8, rf)),
        jnp.int32)
    dt_b8 = timed(lambda: pallas_generate(
        model, variables, prompt8, n_total, temperature=0.0, fast=True))
    b8_rate = 8 * n_gen / dt_b8

    # --- batched kernel at B=16 ---------------------------------------------
    prompt16 = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, size=(16, rf)),
        jnp.int32)
    dt_b16 = timed(lambda: pallas_generate(
        model, variables, prompt16, n_total, temperature=0.0,
        fast=True))
    b16_rate = 16 * n_gen / dt_b16

    # --- lax.scan cached sampler (general path: any batch, video) ----------
    dt_scan = timed(lambda: fast_generate(
        model, variables, prompt, n_total, temperature=0.0))
    scan_rate = n_gen / dt_scan

    # --- reference algorithm on the same chip -----------------------------
    n_base = 256
    dt_naive = timed(lambda: naive_generate(
        model, variables, prompt, rf + n_base, temperature=0.0))
    naive_rate = n_base / dt_naive

    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--skip-check", action="store_true",
                   help="skip the on-hardware correctness gate")
    args, _ = p.parse_known_args()

    steps_per_sec, steps_per_sec_scan8, mfu, train_flops = \
        _train_steps_per_sec()
    check = {"skipped": True} if args.skip_check else \
        _check_on_hardware()

    # sampler per-step latency + its dependent-matvec critical path
    # (30 layers x 2 matmuls + head, all serialized on one sample)
    us_per_step = 1e6 / fast_rate

    print(json.dumps({
        "metric": "ar_mulaw_generation_throughput",
        "value": round(fast_rate, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(
            fast_rate / REFERENCE_TORCH_SAMPLES_PER_SEC, 2),
        "vs_naive_same_chip": round(fast_rate / naive_rate, 2),
        "naive_same_chip_samples_per_sec": round(naive_rate, 2),
        "exact_kernel_samples_per_sec": round(exact_rate, 2),
        "fast_vs_exact_greedy_agreement_512": round(fast_agree, 6),
        "fast_vs_exact_first_divergence_step": fast_first_div,
        "scan_sampler_samples_per_sec": round(scan_rate, 2),
        "batched8_agg_samples_per_sec": round(b8_rate, 2),
        "batched16_agg_samples_per_sec": round(b16_rate, 2),
        "sampler_us_per_step_b1": round(us_per_step, 3),
        "train_steps_per_sec_breakdancing": round(steps_per_sec, 3),
        "train_steps_per_sec_scan8": round(steps_per_sec_scan8, 3),
        "train_mfu_pct": round(mfu, 2),
        "train_model_gflops_per_step": round(train_flops / 1e9, 1),
        "roofline_peaks": {"bf16_tflops": V5E_PEAK_TFLOPS,
                           "hbm_gbs": V5E_PEAK_HBM_GBS},
        "check": check,
    }))


if __name__ == "__main__":
    main()
