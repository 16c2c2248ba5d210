"""Test harness: force CPU with 8 virtual devices so sharding tests run
without a TPU pod (SURVEY.md §4.5). Must run before jax is imported."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the interpret-mode kernel-parity tests are
# dominated by XLA CPU compiles of the lowered kernel bodies; caching makes
# re-runs fast.
from gpuraytracer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from gpuraytracer_tpu.scene import cornell_box
    return cornell_box(resolution=(64, 48))


@pytest.fixture(scope="session")
def sphere_scene():
    from gpuraytracer_tpu.scene import cornell_box_with_spheres
    return cornell_box_with_spheres(resolution=(64, 64))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
