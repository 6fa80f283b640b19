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

# Persistent compilation cache: the suite's wall time is dominated by XLA
# compiles of small graphs (one CPU core in this image); warm runs skip
# them. Keyed by platform, so it never collides with the TPU cache
# (.jax_cache/, bench.py) — kept separate anyway so either can be wiped
# independently. Trivial sub-second compiles are not worth the disk churn.
# Sub-keyed per host CPU: XLA:CPU AOT cache entries embed target features
# the cache key ignores, so a cache written on another machine can load
# SIGILL-prone code (observed in MULTICHIP_r03.json's tail; same fix in
# __graft_entry__._cpu_cache_dir).
import sys as _sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)
from __graft_entry__ import _cpu_cache_dir  # noqa: E402

_cache_dir = _cpu_cache_dir(_repo_root)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
