"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The image's sitecustomize registers the remote 'axon' TPU backend and pins
``JAX_PLATFORMS=axon`` (env-var overrides are ignored), so tests must switch
platforms via ``jax.config`` — otherwise every op runs over the TPU tunnel
and intermittent network stalls dominate. Sharding/collective code is
validated on XLA's host-platform device emulation, the TPU analogue of a fake
backend (SURVEY §4.6).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# This box has 2 cores and slow XLA compiles; the persistent compilation
# cache turns repeat runs from minutes into seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
