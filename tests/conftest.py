"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the standard JAX substitute for multi-chip hardware (SURVEY.md §4):
sharded train/eval steps are exercised on fake devices so the full pjit path
compiles and runs in CI without TPUs.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util
import pathlib

import pytest

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
