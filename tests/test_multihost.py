"""Multi-host `jax.distributed` bring-up: 2 real processes, byte parity.

VERDICT r2 item 6: `initialize_distributed` (uvol_tpu/parallel/mesh.py)
must actually be exercised. The check spawns two coordinator-connected
CPU processes (4 virtual devices each) and runs the production
mesh-sharded codecs over the 8-device GLOBAL mesh; this file then pins
the multi-process artifacts byte-identical to the plain single-process
codecs (the same contract the 8-virtual-device tests pin for
single-process sharding)."""

import jax
import pytest

from uvol_tpu.parallel.multihost import run_codecs, run_two_process_check


@pytest.fixture(scope="module")
def multihost_result():
    return run_two_process_check()


def test_two_process_distributed_bringup(multihost_result):
    assert multihost_result["n_global_devices"] == 8
    assert multihost_result["n_local_devices"] == 4


def test_multihost_matches_single_process(multihost_result):
    # same inputs, no mesh, this (single) process: byte parity end-to-end
    ref = run_codecs(mesh=None, n_frames=multihost_result["n_global_devices"] * 2)
    for key in ("geo_blobs", "geo_decoded", "tex_blob", "tex_decoded"):
        assert multihost_result[key] == ref[key], key


def test_multihost_matches_single_process_sharded(multihost_result):
    # ... and the single-process 8-virtual-device sharded codec agrees too
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from uvol_tpu.parallel.mesh import make_mesh

    ref = run_codecs(
        mesh=make_mesh(8), n_frames=multihost_result["n_global_devices"] * 2
    )
    for key in ("geo_blobs", "geo_decoded", "tex_blob", "tex_decoded"):
        assert multihost_result[key] == ref[key], key
