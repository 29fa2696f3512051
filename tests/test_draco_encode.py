"""Draco encoder roundtrip tests.

The encoder must produce streams our golden-validated decoder accepts, for
every topology class the Edgebreaker machine distinguishes (open/closed,
multi-component, genus>0), with all four liam attribute kinds (quantized
positions, seamed portable tex-coords, octahedral geometric normals,
integer generics). The liam re-encode test is the VERDICT r1 "Done" bar:
encode(decode(liam)) re-decodes to identical faces/attributes.
"""

import numpy as np
import pytest

from uvol_tpu.codecs.draco import constants as K
from uvol_tpu.codecs.draco.decoder import decode_drc
from uvol_tpu.codecs.draco.encoder import AttributeToEncode, encode_drc


def tri_grid(nx, ny):
    idx = lambda i, j: i * ny + j
    pos = np.array(
        [
            [i, j, np.sin(i * 0.3) + np.cos(j * 0.2)]
            for i in range(nx)
            for j in range(ny)
        ],
        np.float32,
    )
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = idx(i, j), idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)
            faces.append([a, b, c])
            faces.append([a, c, d])
    return pos, np.array(faces, np.int32)


def uv_sphere(nu=12, nv=9):
    verts = [[0, 0, 1]]
    for i in range(1, nv):
        th = np.pi * i / nv
        for j in range(nu):
            ph = 2 * np.pi * j / nu
            verts.append(
                [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)]
            )
    verts.append([0, 0, -1])
    faces = []
    for j in range(nu):
        faces.append([0, 1 + j, 1 + (j + 1) % nu])
    for i in range(nv - 2):
        r0, r1 = 1 + i * nu, 1 + (i + 1) * nu
        for j in range(nu):
            a, b = r0 + j, r0 + (j + 1) % nu
            c, d = r1 + j, r1 + (j + 1) % nu
            faces.append([a, c, d])
            faces.append([a, d, b])
    last = len(verts) - 1
    r0 = 1 + (nv - 2) * nu
    for j in range(nu):
        faces.append([last, r0 + (j + 1) % nu, r0 + j])
    return np.array(verts, np.float32), np.array(faces, np.int32)


def torus(nu=10, nv=8, R=2.0, r=0.7):
    verts = []
    for i in range(nu):
        for j in range(nv):
            u, v = 2 * np.pi * i / nu, 2 * np.pi * j / nv
            verts.append(
                [
                    (R + r * np.cos(v)) * np.cos(u),
                    (R + r * np.cos(v)) * np.sin(u),
                    r * np.sin(v),
                ]
            )
    faces = []
    idx = lambda i, j: (i % nu) * nv + (j % nv)
    for i in range(nu):
        for j in range(nv):
            a, b, c, d = idx(i, j), idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)
            faces.append([a, b, c])
            faces.append([a, c, d])
    return np.array(verts, np.float32), np.array(faces, np.int32)


def roundtrip_positions(pos, faces, qbits=14):
    att = AttributeToEncode(
        K.ATT_POSITION, pos, faces.reshape(-1), quantization_bits=qbits
    )
    blob = encode_drc(faces, [att])
    m = decode_drc(blob)
    dpos = m.point_attribute(0)
    # nearest-vertex correspondence, then canonical face-set equality
    d2 = ((dpos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    nn = d2.argmin(1)
    assert np.sqrt(d2[np.arange(len(dpos)), nn]).max() < 1e-3 * max(
        1.0, np.abs(pos).max()
    )

    def canon(f):
        out = set()
        for t in f:
            k = int(np.argmin(t))
            out.add(tuple(np.roll(t, -k)))
        return out

    assert canon(faces) == canon(nn[m.faces])
    return m


def test_encode_open_grid():
    roundtrip_positions(*tri_grid(8, 7))


def test_encode_closed_sphere():
    roundtrip_positions(*uv_sphere())


def test_encode_multi_component():
    p1, f1 = uv_sphere(8, 6)
    p2, f2 = tri_grid(4, 4)
    pos = np.concatenate([p1, p2 + np.float32([5, 5, 5])])
    faces = np.concatenate([f1, f2 + len(p1)]).astype(np.int32)
    roundtrip_positions(pos, faces)


def test_encode_torus_topology_splits():
    roundtrip_positions(*torus())


def test_encode_standard_traversal_coder():
    """Bit-coded CLER stream (MESH_EDGEBREAKER_STANDARD_ENCODING) — the
    alternate traversal coder the format defines; exercises the decode-side
    finish_symbols path (round-1 NotImplementedError)."""
    for pos, faces in (tri_grid(8, 7), uv_sphere(), torus()):
        att = AttributeToEncode(
            K.ATT_POSITION, pos, faces.reshape(-1), quantization_bits=14
        )
        blob = encode_drc(faces, [att], traversal_encoding="standard")
        m = decode_drc(blob)
        dpos = m.point_attribute(0)
        d2 = ((dpos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
        nn = d2.argmin(1)
        assert np.sqrt(d2[np.arange(len(dpos)), nn]).max() < 1e-3 * max(
            1.0, np.abs(pos).max()
        )

        def canon(f):
            return {
                tuple(np.roll(t, -int(np.argmin(t)))) for t in f
            }

        assert canon(faces) == canon(nn[m.faces])


def test_encode_standard_with_uv_seams():
    nx, ny = 6, 5
    pos, faces = tri_grid(nx, ny)
    uv = np.random.default_rng(0).uniform(0, 1, (len(pos), 2)).astype(
        np.float32
    )
    atts = [
        AttributeToEncode(K.ATT_POSITION, pos, faces.reshape(-1), 12),
        AttributeToEncode(K.ATT_TEX_COORD, uv, faces.reshape(-1), 12),
    ]
    blob = encode_drc(faces, atts, traversal_encoding="standard")
    m = decode_drc(blob)
    duv = m.point_attribute(3)
    dpos = m.point_attribute(0)
    d2 = ((dpos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    nn = d2.argmin(1)
    assert np.abs(duv - uv[nn]).max() < 1e-3


def test_encode_all_attributes_with_uv_seam():
    nx, ny = 8, 7
    pos, faces = tri_grid(nx, ny)
    F = len(faces)
    uvvals, uvmap = [], {}

    def uvid(i, j, chart):
        key = (i, j, chart)
        if key not in uvmap:
            uvmap[key] = len(uvvals)
            uvvals.append([i / (nx - 1) * 0.5 + chart * 0.5, j / (ny - 1)])
        return uvmap[key]

    uv_faces = np.zeros((F, 3), np.int64)
    fi = 0
    for i in range(nx - 1):
        for j in range(ny - 1):
            chart = 0 if i < 3 else 1
            tris = (
                [(i, j), (i + 1, j), (i + 1, j + 1)],
                [(i, j), (i + 1, j + 1), (i, j + 1)],
            )
            for t in range(2):
                for k, (ii, jj) in enumerate(tris[t]):
                    uv_faces[fi + t, k] = uvid(ii, jj, chart)
            fi += 2
    uvvals = np.array(uvvals, np.float32)
    nrm = (pos / np.linalg.norm(pos + 1e-6, axis=1, keepdims=True)).astype(
        np.float32
    )
    gen = (np.arange(len(pos)) % 7).astype(np.uint8).reshape(-1, 1)
    atts = [
        AttributeToEncode(K.ATT_POSITION, pos, faces.reshape(-1), 14),
        AttributeToEncode(K.ATT_TEX_COORD, uvvals, uv_faces.reshape(-1), 12),
        AttributeToEncode(K.ATT_NORMAL, nrm, faces.reshape(-1), 8),
        AttributeToEncode(K.ATT_GENERIC, gen, faces.reshape(-1), integer=True),
    ]
    blob = encode_drc(faces, atts)
    m = decode_drc(blob)
    assert m.num_points == len(pos) + ny  # seam column split once
    dpos, duv, dnrm, dgen = (m.point_attribute(t) for t in (0, 3, 1, 4))
    d2 = ((dpos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    nn = d2.argmin(1)
    for p in range(m.num_points):
        i, j = divmod(int(nn[p]), ny)
        cands = [uvvals[uvmap[(i, j, c)]] for c in (0, 1) if (i, j, c) in uvmap]
        assert min(np.abs(np.asarray(c) - duv[p]).max() for c in cands) < 1e-3
    assert np.abs(dnrm - nrm[nn]).max() < 0.03  # 8-bit octahedral
    np.testing.assert_array_equal(dgen[:, 0], gen[nn, 0])


def test_sequential_mesh_roundtrip():
    """MESH_SEQUENTIAL_ENCODING: delta-coded indices, linear attributes."""
    from uvol_tpu.codecs.draco.sequential import encode_drc_sequential

    pos, faces = tri_grid(7, 6)
    uv = np.random.default_rng(1).uniform(0, 1, (len(pos), 2)).astype(np.float32)
    gen = (np.arange(len(pos)) % 5).astype(np.uint8).reshape(-1, 1)
    atts = [
        AttributeToEncode(K.ATT_POSITION, pos, faces.reshape(-1), 14),
        AttributeToEncode(K.ATT_TEX_COORD, uv, faces.reshape(-1), 12),
        AttributeToEncode(K.ATT_GENERIC, gen, faces.reshape(-1), integer=True),
    ]
    blob = encode_drc_sequential(faces, atts)
    m = decode_drc(blob)
    np.testing.assert_array_equal(m.faces, faces)
    assert np.abs(m.point_attribute(0) - pos).max() < 1e-3
    assert np.abs(m.point_attribute(3) - uv).max() < 1e-3
    np.testing.assert_array_equal(m.point_attribute(4)[:, 0], gen[:, 0])


def test_point_cloud_roundtrip():
    """POINT_CLOUD + sequential attribute coding."""
    from uvol_tpu.codecs.draco.sequential import encode_drc_point_cloud

    r = np.random.default_rng(2)
    pos = r.uniform(-1, 1, (500, 3)).astype(np.float32)
    col = r.integers(0, 255, (500, 3)).astype(np.uint8)
    atts = [
        AttributeToEncode(K.ATT_POSITION, pos, np.arange(500), 14),
        AttributeToEncode(K.ATT_COLOR, col, np.arange(500), integer=True),
    ]
    blob = encode_drc_point_cloud(atts)
    m = decode_drc(blob)
    assert m.num_points == 500
    assert len(m.faces) == 0
    assert np.abs(m.point_attribute(0) - pos).max() < 1e-3
    np.testing.assert_array_equal(m.point_attribute(2), col)


@pytest.mark.slow
def test_liam_reencode_roundtrip(liam_output):
    """VERDICT r1 item 2 'Done (a)': encode(decode(liam frame)) re-decodes
    to identical faces and attributes (positions bit-exact; UVs within one
    dequantization ulp; normals within 8-bit octahedral quantization)."""
    data = (liam_output / "geometry_draco" / "00000.drc").read_bytes()
    m = decode_drc(data)
    pos_a = m.attribute_by_type(K.ATT_POSITION)
    uv_a = m.attribute_by_type(K.ATT_TEX_COORD)
    nrm_a = m.attribute_by_type(K.ATT_NORMAL)
    gen_a = m.attribute_by_type(K.ATT_GENERIC)
    faces = pos_a.corner_to_value.reshape(-1, 3)
    atts = [
        AttributeToEncode(K.ATT_POSITION, pos_a.values, pos_a.corner_to_value, 11),
        AttributeToEncode(K.ATT_TEX_COORD, uv_a.values, uv_a.corner_to_value, 10),
        AttributeToEncode(K.ATT_NORMAL, nrm_a.values, nrm_a.corner_to_value, 8),
        AttributeToEncode(
            K.ATT_GENERIC, gen_a.values, gen_a.corner_to_value, integer=True
        ),
    ]
    blob = encode_drc(faces, atts)
    m2 = decode_drc(blob)
    assert m2.num_points == m.num_points
    assert len(m2.faces) == len(m.faces)

    # align faces by their (bit-exact) position triples, canonically rotated
    def face_index(mm):
        pos = mm.point_attribute(0)
        keys = {}
        for fi, f in enumerate(mm.faces):
            tri = [tuple(pos[v]) for v in f]
            k = min(range(3), key=lambda i: tri[i])
            keys[tuple(tri[k:] + tri[:k])] = (fi, k)
        return keys

    k1, k2 = face_index(m), face_index(m2)
    assert set(k1) == set(k2), "position triples not bit-exact"
    uv1, uv2 = m.point_attribute(3), m2.point_attribute(3)
    n1, n2 = m.point_attribute(1), m2.point_attribute(1)
    g1, g2 = m.point_attribute(4), m2.point_attribute(4)
    uv_max = nrm_max = gen_max = 0.0
    for key, (f1, r1) in k1.items():
        f2, r2 = k2[key]
        for c in range(3):
            v1 = m.faces[f1][(r1 + c) % 3]
            v2 = m2.faces[f2][(r2 + c) % 3]
            uv_max = max(uv_max, float(np.abs(uv1[v1] - uv2[v2]).max()))
            nrm_max = max(nrm_max, float(np.abs(n1[v1] - n2[v2]).max()))
            gen_max = max(gen_max, abs(int(g1[v1][0]) - int(g2[v2][0])))
    assert nrm_max == 0.0, nrm_max  # oct re-quantization is lossless
    assert gen_max == 0
    assert uv_max < 3e-7, uv_max  # 1-ulp dequant rounding from re-derived range


def test_reencode_size_near_draco(liam_output):
    """Re-encoding a real frame must stay within a few percent of
    draco_encoder's own output size (locks the UV-orientation and
    symbol-coding rate work; round 2 reached 1.02-1.03x)."""
    import uvol_tpu.codecs.draco.decoder as D
    from uvol_tpu.codecs.draco import constants as K

    data = (liam_output / "geometry_draco" / "00000.drc").read_bytes()
    m = D.decode_drc(data)
    atts = []
    for t, bits in ((K.ATT_POSITION, 11), (K.ATT_TEX_COORD, 10),
                    (K.ATT_NORMAL, 8)):
        a = m.attribute_by_type(t)
        if a is not None:
            atts.append(AttributeToEncode(t, a.values, a.corner_to_value, bits))
    g = m.attribute_by_type(K.ATT_GENERIC)
    if g is not None:
        atts.append(
            AttributeToEncode(
                K.ATT_GENERIC, g.values, g.corner_to_value, integer=True
            )
        )
    blob = encode_drc(atts[0].corner_to_value.reshape(-1, 3), atts)
    assert len(blob) <= len(data) * 1.06, (len(blob), len(data))


def test_vertex_color_srgb_to_linear():
    """decode_drc(vertex_color_space="srgb") converts COLOR attributes
    with the three.js SRGBToLinear curve (DRACOLoader.js:222-240),
    normalizing integer colors to [0,1] float and leaving alpha alone."""
    from uvol_tpu.codecs.draco.decoder import srgb_to_linear

    pos, faces = tri_grid(5, 5)
    r = np.random.default_rng(11)
    rgba = r.integers(0, 256, (len(pos), 4)).astype(np.uint8)
    atts = [
        AttributeToEncode(K.ATT_POSITION, pos, faces.reshape(-1), 14),
        AttributeToEncode(
            K.ATT_COLOR, rgba, faces.reshape(-1), integer=True
        ),
    ]
    blob = encode_drc(faces, atts)

    plain = decode_drc(blob)
    lin = decode_drc(blob, vertex_color_space="srgb")
    c_plain = plain.attribute_by_type(K.ATT_COLOR).values
    c_lin = lin.attribute_by_type(K.ATT_COLOR).values
    assert c_lin.dtype == np.float32 and c_lin.shape == c_plain.shape
    norm = c_plain.astype(np.float32) / 255.0
    np.testing.assert_allclose(c_lin[:, :3], srgb_to_linear(norm[:, :3]),
                               rtol=1e-6)
    np.testing.assert_allclose(c_lin[:, 3], norm[:, 3], rtol=1e-6)  # alpha
    # curve sanity: endpoints fixed, strictly below identity mid-range
    assert srgb_to_linear(np.float32(0.0)) == 0.0
    assert abs(srgb_to_linear(np.float32(1.0)) - 1.0) < 1e-6
    assert srgb_to_linear(np.float32(0.5)) < 0.5


# ---------------------------------------------------------------------------
# KD-tree point clouds (UVT profile — codecs/draco/kdtree.py)
# ---------------------------------------------------------------------------


def _cloud(n=4000, seed=0, clusters=12):
    r = np.random.default_rng(seed)
    centers = r.uniform(-1, 1, (clusters, 3))
    pts = (
        centers[r.integers(0, clusters, n)] + r.normal(0, 0.02, (n, 3))
    ).astype(np.float32)
    col = r.integers(0, 256, (n, 3)).astype(np.uint8)
    return pts, col


def test_kdtree_point_cloud_roundtrip():
    from uvol_tpu.codecs.draco.kdtree import encode_drc_point_cloud_kdtree

    pts, col = _cloud()
    atts = [
        AttributeToEncode(K.ATT_POSITION, pts, np.arange(len(pts)), 14),
        AttributeToEncode(
            K.ATT_GENERIC, col, np.arange(len(pts)), integer=True
        ),
    ]
    blob = encode_drc_point_cloud_kdtree(atts)
    m = decode_drc(blob)
    assert m.num_points == len(pts)
    dpos = m.point_attribute(0)
    dcol = m.point_attribute(4)
    # KD order is a permutation: pair rows by sorting the POST-quantization
    # expectation (pre-quant floats can reorder near-ties), with colors as
    # tiebreak columns so duplicate positions pair deterministically
    from uvol_tpu.codecs.draco.encoder import quantize_attribute

    q = quantize_attribute(pts, 14)
    delta = float(q.range_value) / ((1 << 14) - 1)
    exp = (q.mins.astype(np.float64) + q.ints * delta).astype(np.float32)
    o1 = np.lexsort(np.concatenate([col, exp], axis=1).T)
    o2 = np.lexsort(np.concatenate([dcol, dpos], axis=1).T)
    np.testing.assert_array_equal(exp[o1], dpos[o2])
    np.testing.assert_array_equal(col[o1], dcol[o2])


def test_kdtree_beats_sequential_on_duplicates():
    """Duplicate-heavy clouds collapse into shared KD prefixes."""
    from uvol_tpu.codecs.draco.kdtree import encode_drc_point_cloud_kdtree
    from uvol_tpu.codecs.draco.sequential import encode_drc_point_cloud

    r = np.random.default_rng(3)
    uniq = r.uniform(0, 1, (50, 3)).astype(np.float32)
    pts = uniq[r.integers(0, 50, 6000)]
    atts = lambda: [  # noqa: E731
        AttributeToEncode(K.ATT_POSITION, pts, np.arange(len(pts)), 14)
    ]
    kd = encode_drc_point_cloud_kdtree(atts())
    seq = encode_drc_point_cloud(atts())
    assert len(kd) < len(seq) / 3, (len(kd), len(seq))
    m = decode_drc(kd)
    assert m.num_points == len(pts)


def test_kdtree_rejects_draco_wire_id_and_corruption():
    from uvol_tpu.codecs.draco.kdtree import encode_drc_point_cloud_kdtree

    pts, _ = _cloud(400)
    atts = [AttributeToEncode(K.ATT_POSITION, pts, np.arange(len(pts)), 12)]
    blob = bytearray(encode_drc_point_cloud_kdtree(atts))
    # real draco KD method id still raises the documented NotImplemented
    # method byte sits after MAGIC(5) + major + minor + encoder_type
    draco_id = bytes(blob[:8]) + bytes([1]) + bytes(blob[9:])
    with pytest.raises(NotImplementedError, match="KD-tree"):
        decode_drc(draco_id)
    # corruption/truncation must raise, never crash or hang
    r = np.random.default_rng(7)
    for _ in range(60):
        bb = bytearray(blob)
        for i in r.integers(10, len(bb), 3):
            bb[i] ^= 1 << int(r.integers(0, 8))
        try:
            decode_drc(bytes(bb))
        except (ValueError, NotImplementedError, IndexError):
            pass
    for cut in range(8, len(blob), max(1, len(blob) // 25)):
        try:
            decode_drc(bytes(blob[:cut]))
        except (ValueError, NotImplementedError, IndexError):
            pass
