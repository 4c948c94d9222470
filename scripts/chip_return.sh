#!/bin/bash
# Sequential on-chip revalidation after a TPU outage (committed per
# round-3 VERDICT weak #6 / next-round item 5; the /tmp original died
# with the round-3 machine).
#
# Rules earned in round 3 (see BENCH_NOTES.md "Lease safety"):
#   * ONE process on the chip at a time — the tunnel serialises the
#     lease, concurrent JAX processes deadlock each other.
#   * Generous timeouts and NO mid-run kills: a SIGKILLed lease holder
#     wedges the tunnel for hours ("defer-release").
#   * Fresh kernels compile in ~50 s each through the remote-compile
#     relay; budget minutes, not seconds.
#
# Order: cheap sanity first (train drive), then the composite step
# bench, then the sampler-variant lowering probe (exact / speculative /
# fast / fast+spec rates + spec==exact bit check).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

python scripts/quick_train_bench.py 2>&1 | grep -v WARN | tail -6

python - <<'PYEOF' 2>&1 | grep -v WARN | tail -8
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent))
import numpy as np
from movenet_tpu.utils.chiplock import chip_lock
_lock = chip_lock("chip_return_sampler_probe", timeout_s=900)
_lock.__enter__()  # held until process exit (kernel releases the fd)
import jax, jax.numpy as jnp
from movenet_tpu.config import ModelConfig
from movenet_tpu.models.wavenet import make_wavenet
from movenet_tpu.ops.pallas.ar_sampler import pallas_generate

# Sampler-variant Mosaic lowering + rates on random weights (miss
# regime for the speculative guesser; trained-model rates live in
# bench.py's _trained_model_record).
cfg = ModelConfig(layer_size=10, stack_size=3, input_channels=256,
                  residual_channels=64, skip_channels=64,
                  compute_dtype="float32")
model = make_wavenet(cfg)
rf = model.receptive_fields
rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, 256, size=(1, rf)), jnp.int32)
variables = model.init(jax.random.PRNGKey(0), prompt)
n = rf + 4000
for kw in ({}, {"speculative": True, "return_stats": True},
           {"speculative": True, "spec_order": 2, "return_stats": True},
           {"speculative": True, "spec_depth": 2, "return_stats": True},
           {"fast": True},
           {"fast": True, "speculative": True, "return_stats": True}):
    t0 = time.time()
    out = pallas_generate(model, variables, prompt, n,
                          temperature=0.0, **kw)
    codes, hits = out if isinstance(out, tuple) else (out, None)
    a = np.asarray(codes)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        out = pallas_generate(model, variables, prompt, n,
                              temperature=0.0, **kw)
    np.asarray(out[0] if isinstance(out, tuple) else out)
    rate = 3 * 4000 / (time.time() - t0)
    extra = ""
    if hits is not None:
        h = float(hits)
        extra = f", hit rate {h / max(1.0, 4000 - h):.1%}"
    print(f"{kw}: {rate:,.0f} samples/s (compile {compile_s:.0f}s"
          f"{extra})")
    if kw.get("speculative") and not kw.get("fast"):
        base = np.asarray(pallas_generate(model, variables, prompt, n,
                                          temperature=0.0))
        print("  spec==exact:", bool((a == base).all()))
PYEOF
