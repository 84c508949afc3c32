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
