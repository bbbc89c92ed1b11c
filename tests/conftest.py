"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on a host-platform mesh
(xla_force_host_platform_device_count), standing in for a TPU slice —
the distributed-test strategy SURVEY.md §4 calls for. Must run before
the first jax import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The session environment pins JAX_PLATFORMS=axon (the real-TPU tunnel) and a
# sitecustomize registers the axon backend at interpreter start, so the env
# var alone is not enough: override through jax.config after import.
# DLCO_TEST_PLATFORM=tpu keeps the session's own platform string (the tunnel
# registers as "axon" but reports default_backend() == "tpu").
_platform = os.environ.get("DLCO_TEST_PLATFORM", "cpu")
if _platform == "tpu":
    _platform = os.environ.get("JAX_PLATFORMS", "tpu") or "tpu"
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "workspace"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference artifacts not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2215)
