"""Exact offline simulator of the speculative sampler's hit process.

The speculative kernel's OUTPUT is bit-identical to the exact kernel
for any guess sequence (commits require argmax agreement —
ops/pallas/ar_sampler._make_spec_kernel), so the hit/commit dynamics
are a deterministic function of the emitted token stream alone: given
the greedy tokens, the guesser tables, hits, and iteration count can
be replayed in pure numpy without running the kernel.  That makes
flagship-scale hit rates (16k samples, RF 3072 — hours in interpret
mode) computable in milliseconds, and lets guesser variants be
evaluated offline before they are built in-kernel.

Fidelity contract: `simulate_spec_hits` reproduces the kernel's hit
counter EXACTLY for the same token stream and options — asserted by
tests/test_spec_sim.py against the kernel's `return_stats` counter at
every (order, depth, adaptive) combination.  The one caveat is prompt
seeding with duplicate transitions: the kernel seeds via a jnp scatter
whose duplicate-index order is unspecified; this simulator uses
numpy's last-write-wins.  The two agree on the CPU backend (tested);
on other backends a different duplicate order would only shift the
hit RATE, never any output.
"""

from __future__ import annotations

import numpy as np


def simulate_spec_hits(tokens: np.ndarray, c_in: int, rf: int,
                       order: int = 3, depth: int = 1,
                       adaptive: bool = True):
    """Replay the spec kernel's guess/commit process over ``tokens``.

    tokens: (n,) int array — the full greedy sequence INCLUDING the
    rf-length prompt (i.e. exactly what pallas_generate returns).
    Returns (hits, iterations): hits counts committed speculative
    samples (the kernel's ``return_stats`` counter); iterations is the
    number of dependent-chain rounds, so the steps-per-iteration
    multiplier is (n - rf) / iterations.
    """
    if order not in (2, 3):
        raise ValueError(f"order must be 2 or 3, got {order}")
    if depth not in (1, 2):
        raise ValueError(f"depth must be 1 or 2, got {depth}")
    x = np.asarray(tokens, np.int64).ravel()
    n = x.size
    if n <= rf:
        raise ValueError(f"need tokens past the prompt (n={n}, rf={rf})")

    t2 = np.full(c_in, -1, np.int64)
    t2[x[:rf - 1]] = x[1:rf]              # last-write-wins, like np
    t3 = None
    if order == 3:
        t3 = np.full((c_in, c_in), -1, np.int64)
        t3[x[:rf - 2], x[1:rf - 1]] = x[2:rf]

    def guess1(prev, cur):
        if order == 3 and t3[prev, cur] >= 0:
            return t3[prev, cur]
        return t2[cur]

    def guess2(cur, g1):
        # mirrors the kernel's all-zero one-hot degeneration: g1 == -1
        # never reaches a hit2 check, so the value is irrelevant then
        if g1 < 0:
            return -1
        if order == 3 and t3[cur, g1] >= 0:
            return t3[cur, g1]
        return t2[g1]

    hits = 0
    iters = 0
    t = rf                                 # emitting x[t] this round
    while t < n:
        iters += 1
        prev, cur = x[t - 1], x[t]
        nxt = x[t + 1] if t + 1 < n else -2   # real argmax at t
        g1 = guess1(prev, cur)
        hit1 = (t + 1 < n) and (g1 == nxt)
        hit2 = False
        if depth == 2 and hit1:
            nxt_s = x[t + 2] if t + 2 < n else -2
            g2 = guess2(cur, g1)
            hit2 = (t + 2 < n) and (g2 == nxt_s)
        if adaptive:
            if t + 1 < n:
                t2[cur] = nxt
                if order == 3:
                    t3[prev, cur] = nxt
            if hit1 and t + 2 < n:
                t2[g1] = x[t + 2]
                if order == 3:
                    t3[cur, g1] = x[t + 2]
            if hit2 and t + 3 < n:
                t2[x[t + 2]] = x[t + 3]
                if order == 3:
                    t3[g1, x[t + 2]] = x[t + 3]
        adv = 1 + int(hit1) + int(hit2)
        hits += adv - 1
        t += adv
    return hits, iters
