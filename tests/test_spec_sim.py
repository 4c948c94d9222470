"""The offline hit-process simulator must reproduce the speculative
kernel's hit counter EXACTLY — it replays the same guess/commit
dynamics over the (bit-identical) token stream, so any divergence
means one of the two mis-states the algorithm.  Cross-checked in both
the hit-rich (trained) and miss-rich (random weights) regimes at every
(order, depth, adaptive) combination the kernel supports."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.config import ModelConfig
from movenet_tpu.models.wavenet import make_wavenet
from movenet_tpu.ops.pallas.ar_sampler import pallas_generate
from movenet_tpu.utils.spec_sim import simulate_spec_hits
# shares test_pallas_sampler's lru_cache so one pytest process trains
# the deterministic fixture once across both modules
from test_pallas_sampler import _trained_sine as _trained


COMBOS = [
    dict(spec_order=2, spec_depth=1),
    dict(spec_order=3, spec_depth=1),
    dict(spec_order=2, spec_depth=2),
    dict(spec_order=3, spec_depth=2),
    dict(spec_order=3, spec_depth=1, spec_adaptive=False),
    dict(spec_order=3, spec_depth=2, spec_adaptive=False),
]


@pytest.mark.parametrize("kw", COMBOS)
def test_sim_matches_kernel_trained(kw):
    model, trained, codes = _trained()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 201   # odd: exercises the final-hop guards in both
    got, hits = pallas_generate(model, trained, prompt, n,
                                temperature=0.0, interpret=True,
                                speculative=True, return_stats=True,
                                **kw)
    sim_hits, sim_iters = simulate_spec_hits(
        np.asarray(got)[0], c_in=32, rf=rf,
        order=kw.get("spec_order", 3), depth=kw.get("spec_depth", 1),
        adaptive=kw.get("spec_adaptive", True))
    assert sim_hits == int(hits)
    assert sim_iters == (n - rf) - int(hits)


def test_sim_matches_kernel_random(rng_np):
    cfg = ModelConfig(layer_size=3, stack_size=2, input_channels=32,
                      residual_channels=16, skip_channels=16,
                      compute_dtype="float32")
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)),
                         jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), prompt)
    n = rf + 130
    got, hits = pallas_generate(model, variables, prompt, n,
                                temperature=0.0, interpret=True,
                                speculative=True, spec_depth=2,
                                return_stats=True)
    sim_hits, _ = simulate_spec_hits(np.asarray(got)[0], c_in=32,
                                     rf=rf, order=3, depth=2)
    assert sim_hits == int(hits)


def test_sim_validates_inputs():
    with pytest.raises(ValueError, match="order"):
        simulate_spec_hits(np.zeros(10, np.int64), 8, 4, order=4)
    with pytest.raises(ValueError, match="depth"):
        simulate_spec_hits(np.zeros(10, np.int64), 8, 4, depth=3)
    with pytest.raises(ValueError, match="past the prompt"):
        simulate_spec_hits(np.zeros(4, np.int64), 8, 4)
