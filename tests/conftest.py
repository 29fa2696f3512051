"""Test config: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding is tested on a virtual mesh (standard JAX practice;
no multi-chip hardware in CI). bench.py runs on the real TPU instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: ambient env may say axon/tpu
os.environ.pop("JAX_PLATFORM_NAME", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pre-import jax (sitecustomize registering a TPU
# plugin) before this file runs, so env vars alone don't stick — switch
# the platform through the config API as well (works pre-backend-init).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")
LIAM_OUTPUT = REFERENCE_ROOT / "example" / "public" / "liam" / "output"


@pytest.fixture(scope="session")
def liam_output():
    """The reference sample dataset (250 .drc + 50 .ktx2) as golden corpus."""
    if not LIAM_OUTPUT.exists():
        pytest.skip("reference liam corpus not available")
    return LIAM_OUTPUT
