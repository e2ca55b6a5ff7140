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
