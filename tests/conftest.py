"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path).

The XLA_FLAGS env var must be set before jax initializes a backend; the
platform itself is forced via jax.config (which works even when a
sitecustomize has already imported jax and registered a TPU plugin).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from mtg_card_image_segmentation_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    return make_mesh(data=4, space=2)
