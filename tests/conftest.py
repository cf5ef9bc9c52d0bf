"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding tests use the standard JAX trick of
--xla_force_host_platform_device_count (SURVEY.md section 4, point 4);
everything else also runs on CPU for speed and determinism.

Must set env BEFORE jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# 8 virtual CPU devices for sharding tests (jax>=0.8 config route; the
# XLA_FLAGS env above covers older versions)
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

# persistent compile cache: compiles dominate wall-clock on this 1-core host
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


@pytest.fixture(scope="session")
def block_table():
    from vrv_tpu.assets import load_block_table

    return load_block_table()
