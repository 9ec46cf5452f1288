"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 consequence (c)).

NOTE: plain `os.environ["JAX_PLATFORMS"]` is not enough here — the machine's
sitecustomize registers a TPU backend before conftest runs, so we override
via jax.config (which wins over the already-exported JAX_PLATFORMS=axon).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
