"""Test harness config: CPU-only JAX with 8 fake devices.

Tests must be runnable without TPU hardware; multi-chip sharding paths are
validated on a virtual 8-device CPU mesh (SURVEY.md §5.2(6)). This must run
before jax is imported anywhere, hence the env mutation at module import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-registers the TPU platform and
# overrides jax_platforms at interpreter start, silently routing "CPU"
# tests through the TPU tunnel. Override it back after import — this works
# as long as no backend has initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the solver scans compile slowly on CPU
# (minutes cold); caching makes repeated pytest runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
