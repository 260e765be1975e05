"""Test configuration: run on a fake 8-device CPU mesh.

Set platform flags BEFORE jax initializes so multi-device sharding tests
can exercise real GSPMD partitioning without TPU hardware (SURVEY.md §4).
"""

import os

# Hard-set (not setdefault): the environment may pin JAX_PLATFORMS to a
# real TPU backend, but unit tests must run on the fake 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake devices, got {len(devs)}"
    return devs
