"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device emulation instead (SURVEY.md §4 item (f)).

The environment pre-sets JAX_PLATFORMS=axon and a sitecustomize hook
initializes the tunneled-TPU PJRT plugin at interpreter start — before any
conftest code runs — so overriding the env var here is NOT enough: the
platform must be forced through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compile cache for the CPU test graphs — OFF by default:
# serializing the LARGE prover executables reproducibly segfaults XLA-CPU
# inside compilation_cache.put_executable_and_time (re-confirmed round 5 on
# tests/test_bulletproofs.py; small/medium graphs serialize fine, which is
# why the round-5 probe initially looked safe).  Opt in for cache-hit-only
# reruns with BLINDBID_CPU_CACHE=1.
if os.environ.get("BLINDBID_CPU_CACHE", "0") == "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
