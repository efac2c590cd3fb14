"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Must set the environment before jax initializes its backends; pytest
imports conftest.py before any test module, so this is the first jax
touchpoint in the test process.
"""

import os
import sys

# The container presets JAX_PLATFORMS=axon (TPU tunnel); tests must run
# on the virtual CPU mesh — force it, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Single-core container: persistent compile cache makes repeated test
# runs tractable (first run pays XLA compiles, later runs reuse them).
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/test_data"


@pytest.fixture(scope="session")
def test_data_dir(tmp_path_factory):
    """Copy the reference VTU fixtures to a writable directory (binda
    conversion writes alongside the input; /root/reference is read-only)."""
    import shutil

    dst = tmp_path_factory.mktemp("test_data")
    for name in os.listdir(REFERENCE_DATA):
        shutil.copy(os.path.join(REFERENCE_DATA, name), dst / name)
    return dst


@pytest.fixture(scope="session")
def triangle_grid(test_data_dir):
    from interpolate_unstructured_tpu import read_grid

    return read_grid(test_data_dir / "triangle.vtu")


@pytest.fixture(scope="session")
def quad_grid(test_data_dir):
    from interpolate_unstructured_tpu import read_grid

    return read_grid(test_data_dir / "quad.vtu")


@pytest.fixture(scope="session")
def tetra_grid(test_data_dir):
    from interpolate_unstructured_tpu import read_grid

    return read_grid(test_data_dir / "tetra.vtu")


def sample_points(rng, rmin, rmax, n):
    """Uniform samples in a bounding box (test_triangle.f90:33-37)."""
    rmin = np.asarray(rmin, dtype=np.float64)
    rmax = np.asarray(rmax, dtype=np.float64)
    return rmin + rng.random((n, 3)) * (rmax - rmin)
