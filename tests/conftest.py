"""Test configuration: force an 8-device virtual CPU mesh so SPMD/sharding tests run
without TPU hardware (SURVEY §4 plan (d))."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # the harness presets axon (TPU); tests run CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, overriding the env var — force CPU before any backend init.
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted")


@pytest.fixture(autouse=True)
def _reset_ambient_mesh():
    """Builders (tasks/build.py, ssl/pretrain.py) register the training mesh
    globally via layers.set_pallas_mesh; a leaked mesh changes how later tests'
    programs are partitioned (tp_constrain, shard_pallas_over_batch). Reset it
    after every test."""
    yield
    from ssl4gie_tpu.models import layers
    layers._PALLAS_MESH = None
