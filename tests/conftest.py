"""Test configuration: force an 8-device virtual CPU platform, so
multi-chip sharding tests run anywhere (the TPU-native analog of a fake
backend — see SURVEY.md §4).

NOTE: in some environments jax is pre-imported by a sitecustomize hook, so
plain env vars are too late; we set XLA_FLAGS (read lazily at backend init)
and then override the platform through jax.config, which works as long as
no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
