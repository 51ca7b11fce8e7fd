"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4). Note this
environment pre-imports JAX via sitecustomize, so the platform must be
forced through ``jax.config`` (env vars alone are overridden).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
