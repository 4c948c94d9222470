"""Speculative-guesser hit-rate probe across fixture richness.

Round-3 VERDICT item 7 worried that the learned 2-gram guesser
"degrades on richer data".  This probe measures the committed hit
rate of each guesser order on models trained (CPU, interpret-mode
kernels) on fixtures of increasing richness:

  * sine      — the single-tone fixture the suite uses;
  * dual      — two incommensurate tones + amplitude modulation
                (quasi-periodic, never exactly repeats);
  * noisy     — dual + 5% white noise in the TRAINING data (the model
                learns a denoised attractor; greedy decoding then
                walks it).

Run: python scripts/exp_spec_guesser.py [--samples 400] [--steps 200]
Everything runs on CPU (interpret mode); hit rates are exact counters
from the kernel, not estimates, so these numbers are comparable with
the on-chip rates bench.py reports (the kernel is the same math).
"""

import argparse
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from movenet_tpu.config import ModelConfig  # noqa: E402
from movenet_tpu.data.preprocess import mu_law_encode_np  # noqa: E402
from movenet_tpu.models.wavenet import make_wavenet  # noqa: E402
from movenet_tpu.ops.pallas.ar_sampler import pallas_generate  # noqa: E402


def fixtures():
    t = np.arange(0, 60, 0.15)
    rng = np.random.default_rng(0)
    dual = 0.6 * np.sin(t) + 0.35 * np.sin(np.e * t) \
        * (0.8 + 0.2 * np.sin(0.1 * t))
    return {
        "sine": np.sin(t),
        "dual": dual,
        "noisy": dual + 0.05 * rng.standard_normal(t.shape),
    }


def train(wave, c=32, steps=200):
    cfg = ModelConfig(layer_size=3, stack_size=2, input_channels=c,
                      residual_channels=16, skip_channels=16,
                      compute_dtype="float32")
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    codes = mu_law_encode_np(wave, c)
    cj = jnp.asarray(np.tile(codes[None], (2, 1)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), cj)["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    def loss_fn(p):
        logits = model.apply({"params": p}, cj,
                             method=model.train_logits)
        tgt = cj[:, rf:]
        nll = jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
            logits, tgt[..., None], -1)[..., 0]
        return nll.mean()

    step = jax.jit(lambda p, o: (lambda g: tx.update(g, o, p))(
        jax.grad(loss_fn)(p)))
    for _ in range(steps):
        updates, opt = step(params, opt)
        params = optax.apply_updates(params, updates)
    return model, {"params": params}, codes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=400)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    for name, wave in fixtures().items():
        model, trained, codes = train(wave, steps=args.steps)
        rf = model.receptive_fields
        prompt = jnp.asarray(codes[None, :rf], jnp.int32)
        n = rf + args.samples
        for temp in (0.0, 0.3):
            kw = dict(temperature=temp, seed=1, interpret=True)
            want = np.asarray(pallas_generate(model, trained, prompt,
                                              n, **kw))
            row = [f"{name:6s} T={temp}"]
            for order in (2, 3):
                got, hits = pallas_generate(
                    model, trained, prompt, n, speculative=True,
                    spec_order=order, return_stats=True, **kw)
                ok = bool((np.asarray(got) == want).all())
                h = int(hits)
                iters = args.samples - h
                row.append(
                    f"o{order}: {h:4d} hits {h / max(1, iters):6.1%}"
                    f" {args.samples / max(1, iters):.2f}x"
                    f" bit={'OK' if ok else 'FAIL'}")
            print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
