"""Test configuration: run everything on a virtual 8-device CPU mesh.

The hosted axon TPU plugin overrides the JAX_PLATFORMS environment variable,
so the platform must be forced through jax.config before any backend
initializes (hence the top-of-file ordering).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap single-process accumulation: ~270 tests compile hundreds of
    XLA CPU programs into one process, and the compiler has twice
    SEGFAULTED late in a full-suite run (inside backend_compile of
    fresh programs) while the same tests pass in fresh processes.
    Dropping jit caches between modules bounds the resident compiled
    state; programs recompile on next use, so behavior is unchanged."""
    yield
    jax.clear_caches()
