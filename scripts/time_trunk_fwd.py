"""Time ONLY the fused trunk forward (incl. encoders + dispatch).
Used for A/B bisection of kernel/encoder changes."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from movenet_tpu.models.fused import _fused_trunk

    model, cfg, state, batch = bench._breakdancing_setup()
    params = state.params
    codes, video = batch.codes, batch.video
    reps = 32

    trunk_fwd = jax.jit(lambda p: jnp.sum(
        _fused_trunk(model, p, codes, video, None, False)
        .astype(jnp.float32)))
    out = trunk_fwd(params)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = trunk_fwd(params)
    np.asarray(out)
    print(f"trunk_fwd {(time.perf_counter() - t0) / reps * 1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
