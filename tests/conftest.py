"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` (SURVEY §4 item e).

NOTE: the environment pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon
(the TPU tunnel), so setting env vars here is too late for the platform
selection — but the *backend* is not initialized until first use, so
``jax.config.update`` still wins. Eager/compiled ops over the tunnel are
~100x slower than local CPU; tests must never touch it.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent XLA compilation cache: the default suite is compile-dominated
# (full train-step compiles at tiny scale take 1-2 min each on one CPU
# core), and most suite invocations recompile byte-identical programs. A
# warm cache cuts the default tier from ~44 min to well under 30; a cold
# first run is unchanged. Keyed by platform+flags+HLO, so CPU test entries
# never collide with the TPU bench cache (separate dir anyway).
from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.environ.get(
    "ZGDINO_TEST_CACHE_DIR", "/tmp/zgdino_jax_test_cache"))
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
