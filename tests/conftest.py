"""Test configuration: run everything on an 8-virtual-device CPU platform so
sharding/multi-chip paths are exercised without TPU hardware (the reference
has no distributed-test pattern — SURVEY.md §4 — this is ours)."""

import os

# The driver image's sitecustomize imports jax at interpreter startup to
# register the TPU plugin, so env vars set here are too late for jax.config's
# env reads — use config updates (XLA_FLAGS is still read lazily at CPU
# client init, so setting it here works).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_TEST_DIR = os.environ.get("PCL_TPU_REF_DATA", "/root/reference/test")


def reference_pcd(name: str) -> str:
    """Path to a reference dataset fixture; skip the test if unavailable."""
    path = os.path.join(REFERENCE_TEST_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    return path


@pytest.fixture
def rng():
    return np.random.default_rng(42)
