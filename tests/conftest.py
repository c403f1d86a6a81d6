"""Test config: force the CPU backend with 8 virtual devices.

The ambient environment pins ``JAX_PLATFORMS`` to a tunneled TPU backend and
``sitecustomize`` imports jax at interpreter start, so plain env-var edits
here are too late — we must go through ``jax.config`` before any backend
initializes.  8 virtual CPU devices are the standard JAX substitute for
multi-chip hardware (SURVEY.md §4): sharded train/eval steps compile and run
in CI without TPUs.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import importlib.util
import pathlib

import pytest

assert jax.devices()[0].platform == "cpu"

REFERENCE_UTILS = pathlib.Path("/root/reference/models/utils.py")


@pytest.fixture(scope="session")
def reference_utils():
    """The reference repo's utils module (torch CPU), used ONLY as a test
    oracle for parity checks.  Skips if the reference isn't mounted."""
    if not REFERENCE_UTILS.exists():
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location(
        "reference_utils", REFERENCE_UTILS
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
