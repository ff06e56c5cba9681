"""Test configuration: run everything on CPU with 8 virtual devices.

Mirrors the multi-chip test strategy from SURVEY.md §4: real hardware is a
single chip, so sharding correctness is validated on a virtual CPU mesh via
``xla_force_host_platform_device_count``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu"; first axon backend
# init dials the TPU tunnel (~1 min/process). Tests are CPU-only — force cpu
# before any backend is instantiated.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the e2e suites re-trace identical jitted
# steps across modules and across runs; caching cut the suite wall time
# substantially (VERDICT r1 item: 56 min suite). Safe on CPU.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
