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
# cache it across test runs.  The threshold is deliberately high: at 5s the
# cache also captured the pipeline's sharded+donated host-actor executables,
# whose XLA:CPU serialization is pathological (minutes-long hangs, and
# aborts on the truncated entries earlier killed runs left behind) —
# test_pipeline crashed with "Fatal Python error: Aborted" until only the
# long-compile chess graphs were eligible.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
