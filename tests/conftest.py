"""Test harness: force a CPU backend with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (the standard JAX
fake-backend trick).

Note: this image's sitecustomize registers a remote-TPU ('axon') PJRT plugin
and pins ``jax_platforms="axon,cpu"`` at interpreter startup — before conftest
runs — so the env var alone is not enough; we must update jax.config after
import (no backend has initialized yet at collection time, so the XLA_FLAGS
device-count flag still takes effect)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
