"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Must set env vars before jax initializes a backend.
"""

import os

# Force CPU: the surrounding environment may preset JAX_PLATFORMS to a TPU
# plugin (and a site hook may re-set the env var), so use the config API too;
# unit tests need the float64 CPU backend (8 virtual devices for sharding
# tests).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))

# Persistent compilation cache: the suite re-compiles the same jitted
# programs on every run (single-CPU box, XLA compiles dominate several
# tests); cached executables cut repeat runs substantially. Safe to
# delete the directory at any time.
_cache_dir = os.environ.get("MANIAC_TEST_CACHE",
                            os.path.expanduser("~/.cache/maniac-jax-tests"))
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
