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

# Persistent compile cache for the CPU suite: the same tiny-model programs
# are jitted by many test files; caching them on disk (keyed on backend +
# topology, so the 8-virtual-device CPU programs never mix with TPU ones)
# cuts full-suite wall time and — more importantly — the number of live
# XLA:CPU compiler invocations per process (a >60-min single-process run
# was observed to segfault inside backend_compile after ~200 compiles;
# each test passes in isolation).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_runtest_teardown(item, nextitem):
    # Drop jit/tracing caches at module boundaries: bounds the live
    # executable count in long single-process runs (see cache note above).
    if nextitem is None or item.module is not getattr(nextitem, "module",
                                                      None):
        jax.clear_caches()
