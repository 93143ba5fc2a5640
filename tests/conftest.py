"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Per the build contract, multi-chip sharding is validated on
``xla_force_host_platform_device_count=8`` CPU devices; the driver separately
dry-runs the multi-chip path and benches on the real TPU chip.
"""

import os

# Must run before jax initializes its backends. The harness environment pins
# JAX_PLATFORMS to the TPU tunnel platform and its plugin re-asserts itself
# over the env var, so set the env AND override the config after import.
# TOD_TPU_TESTS=1 keeps the real backend instead, enabling the
# hardware-gated tests (e.g. compiled-Pallas parity); the TPU tunnel is
# single-client, so run those serially.
_USE_HW = os.environ.get("TOD_TPU_TESTS") == "1"
if not _USE_HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _USE_HW:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_shared_dbs():
    from tod_tpu.db.backends import InMemoryDb
    InMemoryDb.reset_shared()
    yield
    InMemoryDb.reset_shared()
