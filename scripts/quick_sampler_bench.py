"""Quick sampler throughput check on the real chip (flagship config:
layer=10 stack=3, 256 ch, RF=3072, greedy).  Reports fast + exact
kernel rates and their greedy agreement."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from movenet_tpu.config import ModelConfig
    from movenet_tpu.models.wavenet import make_wavenet
    from movenet_tpu.ops.pallas.ar_sampler import pallas_generate

    cfg = ModelConfig(layer_size=10, stack_size=3, input_channels=256,
                      residual_channels=64, skip_channels=64,
                      compute_dtype="float32")
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 256, size=(1, rf)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), prompt)

    n_gen = 16_000
    n_total = rf + n_gen

    def timed(fn, reps=4):
        np.asarray(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    dt_fast = timed(lambda: pallas_generate(
        model, variables, prompt, n_total, temperature=0.0, fast=True))
    print(f"fast : {n_gen / dt_fast:10,.0f} samples/s "
          f"({dt_fast / n_gen * 1e6:.3f} us/step)", flush=True)

    dt_exact = timed(lambda: pallas_generate(
        model, variables, prompt, n_total, temperature=0.0))
    print(f"exact: {n_gen / dt_exact:10,.0f} samples/s "
          f"({dt_exact / n_gen * 1e6:.3f} us/step)", flush=True)

    agree = float((np.asarray(pallas_generate(
        model, variables, prompt, n_total, temperature=0.0, fast=True))
        == np.asarray(pallas_generate(
            model, variables, prompt, n_total,
            temperature=0.0))).mean())
    print(f"greedy agreement fast-vs-exact: {agree:.6f}")


if __name__ == "__main__":
    main()
