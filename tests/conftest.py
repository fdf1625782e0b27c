"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-device sharding paths
(shard_map + halo exchange over a Mesh) are exercised without TPU hardware —
the standard JAX trick of --xla_force_host_platform_device_count.
This must happen before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend; override it so tests
# run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import reforge_tpu.utils as utils  # noqa: E402

# Don't spam stderr with expected warnings during negative-path tests;
# warnings are still recorded and assertable via utils.recent_warnings().
utils.print_warnings = False

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_warnings():
    utils.clear_warnings()
    yield
