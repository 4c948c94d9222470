"""Tiny overfit-training fixtures shared by tests, probes and bench.

One canonical way to produce a "trained, predictable" WaveNet for
sampler/speculation evidence: overfit a small model on a short
waveform with Adam on the parity CE-on-softmax-free NLL (the plain
logsumexp form — fixtures only need convergence, not the reference's
double-softmax quirk).  Keeping this in ONE place keeps the suite's
measured hit-rate numbers comparable with the probes' (the reference
has no analogue; its only test trains inline,
/root/reference/tests/test_model.py).
"""

from __future__ import annotations

import numpy as np


def train_overfit(wave: np.ndarray, c: int = 32, layer: int = 3,
                  stack: int = 2, r: int = 16, s: int = 16,
                  steps: int = 150, lr: float = 5e-3):
    """Overfit a small WaveNet on ``wave``; returns
    (model, {"params": ...}, mu-law codes of ``wave``)."""
    import jax
    import jax.numpy as jnp
    import optax

    from movenet_tpu.config import ModelConfig
    from movenet_tpu.data.preprocess import mu_law_encode_np
    from movenet_tpu.models.wavenet import make_wavenet

    cfg = ModelConfig(layer_size=layer, stack_size=stack,
                      input_channels=c, residual_channels=r,
                      skip_channels=s, compute_dtype="float32")
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    codes = mu_law_encode_np(wave, c)
    cj = jnp.asarray(np.tile(codes[None], (2, 1)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), cj)["params"]
    tx = optax.adam(lr)
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


def sine_wave() -> np.ndarray:
    """The canonical 400-sample sine fixture the suite trains on."""
    return np.sin(np.arange(0, 60, 0.15))
