"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run hermetically without TPU hardware (SURVEY §4: multi-host tests without a
pod)."""

import os

# Force the CPU platform: the session env may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon), which would send every tiny test compile over the
# network. The env var alone is overridden by the axon plugin, so set the
# config directly too. Set MEMO_TPU_TEST_REAL_DEVICE=1 to opt in to the real
# device.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("MEMO_TPU_TEST_REAL_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def example_dir() -> pathlib.Path:
    d = REPO / "tests" / "data" / "example"
    assert d.exists(), "example FASTA fixtures missing"
    return d


def pytest_configure(config):
    config.addinivalue_line("markers", "oracle: needs the reference repo mounted read-only")
    config.addinivalue_line("markers", "slow: long-running test")
