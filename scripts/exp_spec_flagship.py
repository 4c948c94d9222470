"""Forecast BENCH's flagship speculative hit rates without the chip.

bench.py's trained-model record trains the flagship sampler config
(layer=10 stack=3, C=256, RF=3072) on the 4000-sample sine fixture
ON-CHIP and measures the spec kernel's hit rate over 16k generated
samples.  The hit process is a pure function of the greedy token
stream (utils/spec_sim.py, kernel-cross-checked by
tests/test_spec_sim.py), and the greedy stream itself is
backend-independent at HIGHEST precision — so the same record can be
forecast here: overfit the flagship on CPU via XLA, greedy-generate
with the scan sampler (bit-equal to the exact Pallas kernel — bench's
own gate), then replay the guesser offline.

Run: python scripts/exp_spec_flagship.py [--steps 600] [--n 16000]
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from movenet_tpu.models.sampler import fast_generate  # noqa: E402
from movenet_tpu.utils.fixtures import train_overfit  # noqa: E402
from movenet_tpu.utils.spec_sim import simulate_spec_hits  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n", type=int, default=16_000)
    ap.add_argument("--wave", choices=("sine", "synth"), default="sine",
                    help="sine = bench's exact trained-gate scenario; "
                    "synth = the synthetic-Kinetics chord*AM audio "
                    "(data/synthetic.py) as a serving-realism proxy")
    args = ap.parse_args()

    t0 = time.time()
    if args.wave == "sine":
        # bench.py::_trained_model_record's exact model/data shape
        wave = np.sin(np.arange(0, 400, 0.1))        # 4000 samples
    else:
        from movenet_tpu.data.synthetic import synth_clip

        _, audio = synth_clip(np.random.default_rng(3), category_id=1,
                              duration_s=1.0)
        wave = audio[:4000].astype(np.float64)       # 16 kHz, 0.25 s
    model, trained, codes = train_overfit(
        wave, c=256, layer=10, stack=3, r=64, s=64,
        steps=args.steps, lr=3e-3)
    rf = model.receptive_fields
    print(f"flagship RF={rf} trained {args.steps} steps "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + args.n
    toks = np.asarray(fast_generate(model, trained, prompt, n,
                                    temperature=0.0))[0]
    print(f"greedy {args.n} samples via scan sampler "
          f"({time.time() - t0:.0f}s)", flush=True)

    for order in (2, 3):
        for depth in (1, 2):
            h, it = simulate_spec_hits(toks, c_in=256, rf=rf,
                                       order=order, depth=depth)
            # h/(g-h) == h/it is bench's spec_hit_rate_trained field;
            # above 1.0 it reads as committed spec samples per
            # iteration (a %-style rate is only well-defined at depth 1)
            print(f"order={order} depth={depth}: {h}/{args.n} committed "
                  f"({args.n / it:.2f}x steps/iter, "
                  f"spec_hit_rate_trained={h / it:.3f})", flush=True)


if __name__ == "__main__":
    main()
