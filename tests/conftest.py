"""Test configuration: run everything on a virtual 8-device CPU mesh with
fp64 enabled, so distributed code paths are exercised without TPU hardware
(SURVEY.md section 4: host-platform device-count fakes)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the outer env pins a TPU tunnel
# Keep the shared on-disk compile cache OUT of the test process: an
# in-process cli.main() call would otherwise enable it session-wide,
# and a corrupted entry (crash mid-write by any concurrent process)
# segfaults jax's cache read path.  CPU compiles here are cheap.
os.environ["OTAMG_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute end-to-end fixture runs (deselect with "
        "-m 'not slow')")


REF = "/root/reference"


@pytest.fixture(scope="session")
def class1_fixture_path():
    return os.path.join(REF, "Class1/InputData/data1-500.mat")


@pytest.fixture(scope="session")
def class2_fixture_path():
    return os.path.join(REF, "Class2/InputData/data4-500.mat")
