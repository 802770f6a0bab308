"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (the real environment
has one TPU chip behind a high-latency tunnel).  jax may already be imported
with ``JAX_PLATFORMS`` baked from the environment, so we must override via
``jax.config`` (env edits would be ignored) — but XLA_FLAGS is still read at
backend init, so set it before any backend is created.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
