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

from movenet_tpu.ops.pallas.ar_sampler import pallas_generate  # noqa: E402
from movenet_tpu.utils.fixtures import train_overfit  # noqa: E402


def fixtures():
    t = np.arange(0, 60, 0.15)
    rng = np.random.default_rng(0)
    dual = 0.6 * np.sin(t) + 0.35 * np.sin(np.e * t) \
        * (0.8 + 0.2 * np.sin(0.1 * t))
    # the synthetic Kinetics stand-in's own audio (chord of three
    # category-keyed tones x beat envelope, data/synthetic.py
    # synth_clip) — the closest thing this image has to a
    # kinetics-trained checkpoint's data distribution, decimated to
    # keep the toy model's RF spanning multiple periods
    from movenet_tpu.data.synthetic import synth_clip

    _, audio = synth_clip(np.random.default_rng(3), category_id=1,
                          duration_s=1.0)
    return {
        "sine": np.sin(t),
        "dual": dual,
        "noisy": dual + 0.05 * rng.standard_normal(t.shape),
        "synth": audio[::40][:400].astype(np.float64),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=400)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    for name, wave in fixtures().items():
        model, trained, codes = train_overfit(wave, steps=args.steps)
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
