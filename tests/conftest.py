"""Test config: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding is tested on a virtual mesh (standard JAX practice;
no multi-chip hardware in CI). bench.py runs on the real TPU instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
