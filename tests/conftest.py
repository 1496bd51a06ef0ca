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

# NOTE: do NOT enable the persistent compilation cache here.  Serializing
# the big CPU MSM executables segfaults the process inside
# compilation_cache.put_executable_and_time (XLA CPU export bug, reproduced
# round 1 and round 2); tests recompile instead.  The TPU bench path keeps
# its own cache (axon executables serialize fine).
