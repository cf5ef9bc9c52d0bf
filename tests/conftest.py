"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding tests use the standard JAX trick of
--xla_force_host_platform_device_count (SURVEY.md section 4, point 4);
everything else also runs on CPU for speed and determinism.

Must set env BEFORE jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def block_table():
    from vrv_tpu.assets import load_block_table

    return load_block_table()
