"""Test env: force an 8-virtual-device CPU backend (the "fake backend" for
multi-chip sharding tests, per SURVEY.md §4) before jax initializes.

Note: on this machine the axon TPU plugin ignores the ``JAX_PLATFORMS`` env
var, so ``jax.config.update`` is required (and must run before any backend
is touched).
"""
import os

prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    With ~230+ accumulated XLA:CPU compilations in one process, the NEXT
    large compile segfaults deterministically (observed twice at the same
    suite position in the spec-sampled engine's chunk jit; the same test
    passes in any sub-suite).  Dropping the executable caches between
    modules keeps the accumulation bounded; modules recompile their own
    programs anyway."""
    yield
    jax.clear_caches()
