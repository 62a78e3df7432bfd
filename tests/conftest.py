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
# XLA can abort() the whole process when compiling/serializing a LARGE
# program late in a session that has accumulated many live executables
# (seven observations, each time on the biggest program that runs late —
# test_recovery, then test_stress_gate, then test_vio_multiseq as each got
# isolated/changed; never when the module runs alone; RLIMIT_MEMLOCK is
# pinned at 8 MB in this container).  Two mitigations:
#   * the heaviest full-pipeline modules run in subprocesses
#     (tests/_isolation.py),
#   * live executables are released between modules (below), keeping the
#     in-process accumulation far from the abort threshold.


import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_between_modules():
    yield
    jax.clear_caches()
