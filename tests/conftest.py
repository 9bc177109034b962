"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

SURVEY.md §4: multi-device tests run on CPU via
``--xla_force_host_platform_device_count=8``; the real TPU is only used by
bench.py.
"""

import os

# the shell env pins JAX_PLATFORMS=axon (the tunneled TPU); tests must run on
# the virtual 8-device CPU platform, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize (PYTHONPATH=/root/.axon_site) already imported jax._src, so
# env vars alone are too late — update the live config before backends init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: the suite compiles ~60 programs on one CPU
# core (~30 min cold); cached reruns take minutes
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
