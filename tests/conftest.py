"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first jax import (tests never touch the real
TPU; multi-device sharding logic is exercised via the host-platform trick).
"""

import os

# force CPU even when the session env selects the TPU ('axon') backend —
# tests exercise multi-device logic on a virtual 8-device CPU mesh.
# MYT_TESTS_TPU=1 opts OUT for the few hardware-gated tests (e.g. the
# Pallas on-core PRNG stream stats) — run those file-selected, never as
# part of the full suite (one heavy TPU process at a time, CLAUDE.md).
_USE_TPU = os.environ.get("MYT_TESTS_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags and not _USE_TPU:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: repeat runs skip XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jaxcache" if _USE_TPU else "/tmp/jaxcache-tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the machine's sitecustomize may import jax before this conftest runs (the
# axon TPU plugin registers at interpreter startup), in which case jax has
# already captured JAX_PLATFORMS from the session env — override explicitly
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
