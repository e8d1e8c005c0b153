"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the JAX analogue of the reference's
world-size-1 NCCL smoke trick in scripts/parallel_test.sh — but with real
multi-device sharding).  The axon TPU plugin in this image overrides the
JAX_PLATFORMS env var, so we use jax.config.update before any backend is
initialised instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("UMT_TEST_PLATFORM", "cpu"))

# Persistent compilation cache: the train-step compile is ~1 min on CPU;
# cached re-runs are seconds.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
