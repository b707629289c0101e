"""Test configuration: run on a virtual 8-device CPU mesh.

The container pre-imports jax and selects the tunneled single-chip ``axon``
TPU platform via sitecustomize + JAX_PLATFORMS env.  Tests must run on the
host CPU platform instead (fast compiles, 8 virtual devices for sharding
tests — SURVEY.md §4's multi-host simulation strategy), so we override
through jax.config, which works even though jax is already imported.
"""
import os

# Read at CPU-client init (which hasn't happened yet at conftest time).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache: the chess legality graph takes ~45s to compile;
# cache it across test runs.  Threshold 30s so only those few long-compile
# graphs are serialized — at 5s the cache wrote out dozens of mid-size
# sharded executables, a meaningful extra CPU cost per compile on this
# 2-core CI host (where any sustained core contention can push XLA:CPU's
# hardcoded 40s collective-rendezvous deadline into aborts; see
# tests/test_pipeline.py docstring).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
