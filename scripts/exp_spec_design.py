"""Offline design sweep for FUTURE guesser/depth kernel work.

utils/spec_sim.py replays the shipped kernel's exact dynamics; this
probe generalizes the replay (dict tables, arbitrary order with
fallback chain, arbitrary depth) to answer "what would an order-k /
depth-d guesser buy?" on the flagship token stream BEFORE building it
in-kernel.  Upper-bound analysis only — a real kernel table for
order>=4 would need hashing into a VMEM-sized table, which can only
lower these numbers.

Run: python scripts/exp_spec_design.py [--steps 600] [--n 16000]
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


def replay(toks, rf, order, depth, adaptive=True):
    """Generalized guess/commit replay: dict n-gram tables with a
    fallback chain order -> order-1 -> ... -> 2.  Mirrors the shipped
    kernel's iteration structure (guesses before updates, commits
    advance the cursor, later writes win)."""
    x = np.asarray(toks, np.int64).ravel()
    n = x.size
    tables = {k: {} for k in range(2, order + 1)}
    for k in range(2, order + 1):
        for i in range(rf - k + 1):
            tables[k][tuple(x[i:i + k - 1])] = x[i + k - 1]

    def guess(hist):
        for k in range(order, 1, -1):
            g = tables[k].get(tuple(hist[len(hist) - (k - 1):]))
            if g is not None:
                return g
        return -1

    def update(hist, nxt):
        for k in range(2, order + 1):
            tables[k][tuple(hist[len(hist) - (k - 1):])] = nxt

    hits = 0
    iters = 0
    t = rf
    while t < n:
        iters += 1
        committed = 0
        hist = list(x[t - order + 1:t + 1])
        chain = list(hist)
        for hop in range(depth):
            if t + hop + 1 >= n:
                break
            g = guess(chain)
            if g != x[t + hop + 1]:
                break
            committed += 1
            chain.append(g)
        if adaptive:
            # real transition + one per committed hop
            for hop in range(committed + 1):
                if t + hop + 1 < n:
                    update(list(x[t + hop - order + 2:t + hop + 1]),
                           x[t + hop + 1])
        hits += committed
        t += 1 + committed
    return hits, iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n", type=int, default=16_000)
    args = ap.parse_args()

    t0 = time.time()
    wave = np.sin(np.arange(0, 400, 0.1))
    model, trained, codes = train_overfit(
        wave, c=256, layer=10, stack=3, r=64, s=64,
        steps=args.steps, lr=3e-3)
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    toks = np.asarray(fast_generate(model, trained, prompt,
                                    rf + args.n, temperature=0.0))[0]
    print(f"flagship stream ready ({time.time() - t0:.0f}s)",
          flush=True)
    np.save("/tmp/flagship_toks.npy", toks)

    for order in (2, 3, 4, 5):
        row = [f"order={order}"]
        for depth in (1, 2, 3, 4):
            h, it = replay(toks, rf, order, depth)
            row.append(f"d{depth}: {args.n / it:.2f}x")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
