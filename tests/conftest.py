"""Test environment: force JAX onto 8 virtual CPU devices so multi-chip
sharding paths are exercised without TPU hardware (the TPU-native
answer to the reference's untested torch.distributed layer)."""

import os

# must run before the first jax backend initialization: 8 virtual CPU
# devices, and force the cpu platform even when a TPU plugin (axon) has
# pre-registered itself and set jax_platforms from sitecustomize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)


@pytest.fixture
def sine_codes():
    """Mu-law-encoded sine wave, the reference's golden fixture
    (tests/test_model.py:20-38): sin(arange(0, 400, 0.1)), 256 channels,
    batch of 4."""
    import jax.numpy as jnp
    from movenet_tpu.ops import mu_law_encode

    wave = jnp.asarray(np.sin(np.arange(0, 400, 0.1)), dtype=jnp.float32)
    q = mu_law_encode(wave, 256)
    return jnp.tile(q[None, :], (4, 1))  # (4, 4000) int codes
