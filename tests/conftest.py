"""Test configuration: run on a fake 8-device CPU mesh.

IMPORTANT: this container's sitecustomize imports jax at interpreter
startup (before conftest) and pins ``JAX_PLATFORMS=axon`` (a real tunneled
TPU), so environment variables set here are too late. ``jax.config.update``
still works until the first backend use, so the platform/device-count are
forced through the config API instead (SURVEY.md §4 test plan).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: model-forward compiles dominate test time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# don't persist XLA:CPU AOT executables — they embed exact host CPU feature
# flags and spam feature-mismatch errors when reloaded
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def eight_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs[0]}"
    assert len(devs) == 8, f"expected 8 fake devices, got {len(devs)}"
    return devs
