"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding is validated on this virtual mesh
(xla_force_host_platform_device_count) exactly as the driver's
dryrun_multichip does; real-TPU behavior is covered by bench.py.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_data_root() -> str:
    return "/root/reference"
