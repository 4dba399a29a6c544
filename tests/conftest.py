"""Test environment: force CPU with 8 virtual devices.

SURVEY.md §4.4: multi-chip logic (pjit/shard_map/mesh) is tested on a
virtual CPU mesh — `xla_force_host_platform_device_count=8` — so no TPU
pod is needed.  Must run before jax initializes its backends.
"""

import os

# Force CPU: the session boot hook registers a (slow, tunneled) TPU
# plugin in every interpreter and pins JAX_PLATFORMS past env overrides,
# so the config flag must be set programmatically before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config():
    from nanodecoder_tpu.config import tiny_test_config

    return tiny_test_config()


@pytest.fixture(scope="session")
def tiny_params(tiny_config):
    import jax
    from nanodecoder_tpu.models.model import init_model

    return init_model(jax.random.PRNGKey(0), tiny_config.model)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(1234)
