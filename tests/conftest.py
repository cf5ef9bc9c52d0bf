"""Test harness.

Tests run on the CPU backend (fast, deterministic, no TPU-tunnel
round-trips); JAX_PLATFORMS is forced because the image presets the axon
TPU platform. Multi-device sharding tests need a virtual 8-device CPU
mesh, but the image's sitecustomize initializes the PJRT backend at
interpreter start — before any conftest — pinning the device set; those
tests therefore run in clean subprocesses via `run_in_clean_env` below
(same mechanism as __graft_entry__.dryrun_multichip).
"""

import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets axon (TPU tunnel)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# The axon sitecustomize (loaded via PYTHONPATH at interpreter start) routes
# EVERY XLA compile — even CPU — through a serialized remote-compile tunnel,
# and pins the PJRT device set before conftest runs. Re-exec once with a
# cleaned environment (pytest.ini sets -s, so no capture fds are lost).
if os.environ.get("VRV_TEST_REEXEC") != "1" and "axon_site" in os.environ.get(
    "PYTHONPATH", ""
):
    env = dict(os.environ)
    env["VRV_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        [REPO_ROOT]
        + [p for p in env.get("PYTHONPATH", "").split(":") if p and "axon_site" not in p]
    )
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# persistent compile cache: compiles dominate wall-clock on this 1-core host
# separate cache from TPU/tunnel runs: remotely-compiled CPU AOT entries
# target different machine features and can SIGILL if loaded locally
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_local")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def clean_env(n_devices: int = 8) -> dict:
    """Environment for a subprocess with a virtual n-device CPU mesh."""
    env = dict(os.environ)
    env["VRV_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        [REPO_ROOT]
        + [p for p in env.get("PYTHONPATH", "").split(":") if p and "axon_site" not in p]
    )
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


def run_in_clean_env(code: str, n_devices: int = 8, timeout: int = 1200) -> str:
    """Run python code in a subprocess with n virtual CPU devices."""
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=clean_env(n_devices),
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, f"subprocess failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


@pytest.fixture(scope="session")
def block_table():
    from vrv_tpu.assets import load_block_table

    return load_block_table()
