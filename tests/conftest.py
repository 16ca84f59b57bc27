"""Test configuration: force CPU with 8 virtual devices.

This must run before jax is imported anywhere, so it lives at conftest
import time.  It exercises the same Mesh/shard_map code paths as a real
multi-chip TPU slice (SURVEY.md §4 implication (d)).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The environment pins JAX_PLATFORMS to the TPU plugin; config.update after
# import is the reliable way to force CPU for the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_DATA = pathlib.Path("/root/reference/data")
REFERENCE_OUTPUT = pathlib.Path("/root/reference/output")


@pytest.fixture(scope="session")
def data_dir():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference dataset not available")
    return str(REFERENCE_DATA)


@pytest.fixture(scope="session")
def output_dir():
    if not REFERENCE_OUTPUT.exists():
        pytest.skip("reference output not available")
    return str(REFERENCE_OUTPUT)


@pytest.fixture(scope="session")
def sequence(data_dir):
    from tpuvo.data import load_sequence

    return load_sequence(data_dir, n_frames=121)


@pytest.fixture(scope="session")
def world(data_dir):
    from tpuvo.data import load_world_points

    return load_world_points(os.path.join(data_dir, "world.dat"))


def pytest_configure(config):
    """Build the native loader so tests/test_native.py actually runs
    (one ~2 s g++ invocation; test_native skips with a clear message only
    if the toolchain itself is unavailable)."""
    import subprocess

    csrc = REPO_ROOT / "csrc"
    if (csrc / "loader.cpp").exists() and not (csrc / "libtpuvo_io.so").exists():
        try:
            subprocess.run(
                ["make", "-C", str(csrc)],
                check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            pass


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """The full suite compiles hundreds of XLA programs in one process;
    letting executables accumulate exhausted memory far enough that the
    CPU compiler itself segfaulted (observed at ~50% of the -m '' run).
    Dropping the caches at module boundaries bounds the footprint; each
    module still shares compilations internally."""
    yield
    import jax

    jax.clear_caches()
