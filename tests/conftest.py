"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled so filter numerics can be validated against NumPy oracles.
Must set flags before jax initializes a backend."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the environment presets "axon" (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env presets JAX_PLATFORMS=axon (TPU tunnel) and the plugin ignores a
# later env override; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Compile latency in this environment is high (~0.5-1s per primitive); use a
# persistent compilation cache so repeat test runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# NB: XLA's executable.serialize()/deserialize can abort() the process on
# certain large scan executables (observed three times, always on
# test_recovery's programs, in both the cache get and put paths; disk and
# RAM were fine).  test_recovery disables the persistent cache for its
# module scope; if the abort ever shows up in another module, do the same
# there.
