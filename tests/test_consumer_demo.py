"""Second-language (C) consumer over the uvt_drc_* FFI boundary.

Round-1 verdict item 10: prove the C ABI the way Unity/Android proved the
reference's (corto_codec.cpp + P/Invoke/JNI) — a standalone C program
dlopens the library, decodes a REAL liam frame, and its attribute
checksums must match the Python decoder bit-for-bit.
"""

import os
import pathlib
import re
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
LIAM = pathlib.Path(
    "/root/reference/example/public/liam/output/geometry_draco/00000.drc"
)


def _fnv1a(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@pytest.mark.skipif(not LIAM.exists(), reason="liam corpus not present")
def test_c_consumer_matches_python(tmp_path):
    from uvol_tpu import native

    lib = native.get_draco_lib()
    if lib is None:
        pytest.skip("native draco lib unavailable")
    so_path = lib._name

    exe = tmp_path / "consumer_demo"
    subprocess.run(
        ["gcc", "-O2", str(REPO / "examples" / "consumer_demo.c"),
         "-o", str(exe), "-ldl"],
        check=True,
        capture_output=True,
    )
    out = subprocess.run(
        [str(exe), so_path, str(LIAM)], check=True, capture_output=True,
        text=True,
    ).stdout

    m = re.search(r"faces=(\d+) points=(\d+) attrs=(\d+)", out)
    assert m, out
    faces_c, points_c, attrs_c = map(int, m.groups())

    from uvol_tpu.codecs.draco.decoder import decode_drc

    mesh = decode_drc(LIAM.read_bytes())
    assert faces_c == len(mesh.faces)
    assert points_c == mesh.num_points
    assert attrs_c == len(mesh.attributes)

    conn_c = re.search(r"connectivity fnv1a=([0-9a-f]{16})", out).group(1)
    corners = np.ascontiguousarray(mesh._point_of_corner, np.int32)
    assert int(conn_c, 16) == _fnv1a(corners.tobytes())

    attr_lines = re.findall(
        r"attr\[(\d+)\] type=(\d+) comps=(\d+) values=(\d+) (\w+) "
        r"values_fnv1a=([0-9a-f]{16}) corner_map_fnv1a=([0-9a-f]{16})",
        out,
    )
    assert len(attr_lines) == attrs_c
    for idx, att_type, comps, nvals, dtype, vsum, csum in attr_lines:
        a = mesh.attributes[int(idx)]
        assert int(att_type) == a.attribute_type
        vals = a.values
        if dtype == "f32":
            vals = np.ascontiguousarray(vals, np.float32)
        else:
            vals = np.ascontiguousarray(vals, np.int64)
        assert int(nvals) == len(vals)
        assert int(vsum, 16) == _fnv1a(vals.tobytes()), f"attr {idx} values"
        cmap = np.ascontiguousarray(a.corner_to_value, np.int32)
        assert int(csum, 16) == _fnv1a(cmap.tobytes()), f"attr {idx} corners"


@pytest.mark.skipif(not LIAM.exists(), reason="liam corpus not present")
def test_native_player_plays_liam_bit_exact(tmp_path):
    """examples/native_player.c — a Python-free streaming-player loop
    (decoder pthread + bounded ring + 30 fps clock) over the same FFI.
    Its running position checksum must match the Python decoder across
    every played frame."""
    from uvol_tpu import native

    lib = native.get_draco_lib()
    if lib is None:
        pytest.skip("native draco lib unavailable")
    exe = tmp_path / "native_player"
    subprocess.run(
        ["gcc", "-O2", "-pthread",
         str(REPO / "examples" / "native_player.c"), "-o", str(exe), "-ldl"],
        check=True,
        capture_output=True,
    )
    frames = 12
    out = subprocess.run(
        [str(exe), lib._name, str(LIAM.parent), str(frames), "300"],
        check=True, capture_output=True, text=True,
    ).stdout
    m = re.search(
        r"native_player frames=(\d+) late=(\d+) fps_wall=([\d.]+) "
        r"decode_ms_mean=([\d.]+) fnv=([0-9a-f]{16})",
        out,
    )
    assert m, out
    assert int(m.group(1)) == frames

    from uvol_tpu.codecs.draco.decoder import decode_drc

    h = 0xCBF29CE484222325
    for i in range(frames):
        mesh = decode_drc((LIAM.parent / f"{i:05d}.drc").read_bytes())
        pos = next(
            a for a in mesh.attributes if a.attribute_type == 0
        )
        payload = np.ascontiguousarray(pos.values, np.float32).tobytes()
        for b in payload:
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    assert int(m.group(5), 16) == h
