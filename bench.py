"""Headline benchmark: autoregressive 16 kHz mu-law generation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = samples/sec/chip of the VMEM-resident Pallas sampler
               kernel (movenet_tpu.ops.pallas.ar_sampler) on the
               flagship config (layer=10, stack=3, 256 channels,
               RF=3072 — the reference's tested generation config,
               tests/test_model.py:42-48).  The lax.scan sampler's rate
               is reported as "scan_sampler_samples_per_sec".
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


def main():
    import jax
    import jax.numpy as jnp

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

    def timed(fn, reps=3):
        """Median wall time with a forced host transfer per rep (robust
        against async-dispatch artifacts on tunneled backends)."""
        np.asarray(fn())  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    # --- Pallas VMEM-resident kernel --------------------------------------
    n_gen = 16_000  # one second of 16 kHz audio beyond the prompt
    n_total = rf + n_gen
    dt_pallas = timed(lambda: pallas_generate(
        model, variables, prompt, n_total, temperature=0.0))
    fast_rate = n_gen / dt_pallas

    # --- lax.scan cached sampler (general path: batched, video) -----------
    dt_scan = timed(lambda: fast_generate(
        model, variables, prompt, n_total, temperature=0.0))
    scan_rate = n_gen / dt_scan

    # --- reference algorithm on the same chip -----------------------------
    n_base = 256
    dt_naive = timed(lambda: naive_generate(
        model, variables, prompt, rf + n_base, temperature=0.0))
    naive_rate = n_base / dt_naive

    print(json.dumps({
        "metric": "ar_mulaw_generation_throughput",
        "value": round(fast_rate, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(
            fast_rate / REFERENCE_TORCH_SAMPLES_PER_SEC, 2),
        "vs_naive_same_chip": round(fast_rate / naive_rate, 2),
        "naive_same_chip_samples_per_sec": round(naive_rate, 2),
        "scan_sampler_samples_per_sec": round(scan_rate, 2),
    }))


if __name__ == "__main__":
    main()
