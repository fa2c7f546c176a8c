"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the driver separately dry-runs the multi-chip path)."""

import os

# The environment may pre-import jax with a TPU platform (sitecustomize);
# env vars alone are too late, so pin the platform through jax.config too.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ASSETS = pathlib.Path("/root/reference/DeferredRendering")


@pytest.fixture
def reference_assets() -> pathlib.Path:
    if not REFERENCE_ASSETS.exists():
        pytest.skip("reference asset tree not available")
    return REFERENCE_ASSETS


@pytest.fixture
def asset_loader(reference_assets):
    from direct12pbrrenderer_tpu.resource.loader import ResourceLoader

    loader = ResourceLoader(reference_assets)
    old = ResourceLoader._instance
    ResourceLoader.set_instance(loader)
    yield loader
    ResourceLoader._instance = old
