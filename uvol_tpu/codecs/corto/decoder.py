"""Corto `.crt` decoder — the UVOL 1.0 geometry frame codec.

Decodes the format produced by the reference's C++ encoder
(deprecated/encoder/dev/src/encoder.cpp) and consumed by its JS worker
decoder (src/lib/corto.ts): header + exif + attribute table, groups, the
CLER front-machine connectivity stream, and the per-attribute
values/array/diffs blocks with parallelogram delta decoding.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from uvol_tpu.codecs.corto.stream import CortoInStream

MAGIC = 0x787A6300

# codecs
GENERIC_CODEC = 1
NORMAL_CODEC = 2
COLOR_CODEC = 3

# strategies
PARALLEL = 0x1
CORRELATED = 0x2

# CLER symbols
VERTEX, LEFT, RIGHT, END, BOUNDARY, DELAY, SPLIT = range(7)

# formats
FMT_UINT32, FMT_INT32, FMT_UINT16, FMT_INT16, FMT_UINT8, FMT_INT8, FMT_FLOAT, FMT_DOUBLE = range(8)

# normal predictions
PRED_DIFF, PRED_ESTIMATED, PRED_BORDER = range(3)


@dataclasses.dataclass
class CortoAttribute:
    name: str
    codec: int
    q: float
    components: int
    format: int
    strategy: int
    values: Optional[np.ndarray] = None  # final decoded (nvert, N)
    prediction: int = PRED_DIFF  # normals only
    qc: Optional[List[int]] = None  # colors only


@dataclasses.dataclass
class CortoMesh:
    nvert: int
    nface: int
    faces: np.ndarray  # [nface, 3] int32 (new vertex order)
    attributes: Dict[str, np.ndarray]
    groups: List[dict]
    exif: Dict[str, str]


def _ilog2(p: int) -> int:
    k = 0
    while p > 1:
        p >>= 1
        k += 1
    return k


def decode_crt(data: bytes) -> CortoMesh:
    s = CortoInStream(data)
    if s.u32() != MAGIC:
        raise ValueError("not a .crt file")
    _version = s.u32()
    s.entropy = s.u8()

    exif = {}
    for _ in range(s.u32()):
        key = s.string()
        exif[key] = s.string()

    attrs: Dict[str, CortoAttribute] = {}
    for _ in range(s.u32()):
        name = s.string()
        codec = s.u32()
        q = s.f32()
        components = s.u8()
        fmt = s.u8()
        strategy = s.u8()
        attrs[name] = CortoAttribute(name, codec, q, components, fmt, strategy)

    nvert = s.u32()
    nface = s.u32()

    groups = _decode_groups(s)
    if nface == 0:
        return _decode_point_cloud(s, nvert, attrs, groups, exif)

    # connectivity
    _max_front = s.u32()
    clers = s.decompress_block()
    bitstream = s.read_bitstream()

    faces = np.zeros(nface * 3, np.int64)
    prediction = np.zeros((nvert, 3), np.int64)
    vertex_count = 0
    cler_pos = 0
    splitbits = _ilog2(nvert) + 1

    start = 0
    for g in groups:
        end = g["end"] * 3
        vertex_count, cler_pos = _decode_faces(
            clers, bitstream, faces, prediction, start, end,
            vertex_count, cler_pos, splitbits, nvert,
        )
        start = end

    # attributes: decode -> deltaDecode -> postDelta -> dequantize
    for a in sorted(attrs.values(), key=lambda a: a.name):
        _attr_decode(a, s, nvert)
    for a in attrs.values():
        _attr_delta_decode(a, nvert, prediction)
    for a in attrs.values():
        _attr_post_delta(a, nvert, nface, attrs, faces)
    out = {}
    for a in attrs.values():
        out[a.name] = _attr_dequantize(a, nvert)

    return CortoMesh(
        nvert=nvert,
        nface=nface,
        faces=faces.reshape(-1, 3).astype(np.int32),
        attributes=out,
        groups=groups,
        exif=exif,
    )


def _decode_groups(s: CortoInStream) -> List[dict]:
    groups = []
    for _ in range(s.u32()):
        end = s.u32()
        props = {}
        for _ in range(s.u8()):
            key = s.string()
            props[key] = s.string()
        groups.append({"end": end, "properties": props})
    return groups


def _decode_point_cloud(s, nvert, attrs, groups, exif) -> CortoMesh:
    out = {}
    for a in sorted(attrs.values(), key=lambda a: a.name):
        _attr_decode(a, s, nvert)
    for a in attrs.values():
        _attr_delta_decode(a, nvert, None)
        out[a.name] = _attr_dequantize(a, nvert)
    return CortoMesh(nvert, 0, np.zeros((0, 3), np.int32), out, groups, exif)


# ---------------------------------------------------------------------------
# The CLER front machine (src/lib/corto.ts:142-297)
# ---------------------------------------------------------------------------


def _decode_faces(
    clers, bitstream, faces, prediction, start, end,
    vertex_count, cler, splitbits, nvert,
):
    front_v0: List[int] = []
    front_v1: List[int] = []
    front_v2: List[int] = []
    front_prev: List[int] = []
    front_next: List[int] = []

    def add_front(v0, v1, v2, prev, nxt):
        front_v0.append(v0)
        front_v1.append(v1)
        front_v2.append(v2)
        front_prev.append(prev)
        front_next.append(nxt)

    faceorder: List[int] = []
    order_front = 0
    delayed: List[int] = []
    new_edge = -1

    while start < end:
        if new_edge == -1 and order_front >= len(faceorder) and not delayed:
            # new connected component: initial face
            last_index = vertex_count - 1
            split = 0
            if clers[cler] == SPLIT:
                cler += 1
                split = bitstream.read(3)
            else:
                cler += 1
            vindex = [0, 0, 0]
            for k in range(3):
                if split & (1 << k):
                    v = bitstream.read(splitbits)
                else:
                    prediction[vertex_count] = (last_index, last_index, last_index)
                    v = vertex_count
                    last_index = v
                    vertex_count += 1
                vindex[k] = v
                faces[start] = v
                start += 1
            current_edge = len(front_v0)
            for kk in range(3):
                faceorder.append(len(front_v0))
                a, b, c = vindex[(kk + 1) % 3], vindex[(kk + 2) % 3], vindex[kk]
                add_front(
                    a, b, c,
                    current_edge + (kk + 2) % 3,
                    current_edge + (kk + 1) % 3,
                )
            continue

        if new_edge != -1:
            edge = new_edge
            new_edge = -1
        elif order_front < len(faceorder):
            edge = faceorder[order_front]
            order_front += 1
        else:
            edge = delayed.pop()

        if front_v0[edge] < 0:
            continue  # deleted

        c = clers[cler]
        cler += 1
        if c == BOUNDARY:
            continue

        v0 = front_v0[edge]
        v1 = front_v1[edge]
        v2 = front_v2[edge]
        prev = front_prev[edge]
        nxt = front_next[edge]
        new_edge = len(front_v0)
        opposite = -1

        if c == VERTEX or c == SPLIT:
            if c == SPLIT:
                opposite = bitstream.read(splitbits)
            else:
                prediction[vertex_count] = (v1, v0, v2)
                opposite = vertex_count
                vertex_count += 1
            front_next[prev] = new_edge
            front_prev[nxt] = new_edge + 1
            add_front(v0, opposite, v1, prev, new_edge + 1)
            faceorder.append(len(front_v0))
            add_front(opposite, v1, v0, new_edge, nxt)
        elif c == LEFT:
            front_next[front_prev[prev]] = new_edge
            front_prev[nxt] = new_edge
            opposite = front_v0[prev]
            add_front(opposite, v1, v0, front_prev[prev], nxt)
            front_v0[prev] = -1
        elif c == RIGHT:
            front_prev[front_next[nxt]] = new_edge
            front_next[prev] = new_edge
            opposite = front_v1[nxt]
            add_front(v0, opposite, v1, prev, front_next[nxt])
            front_v0[nxt] = -1
        elif c == DELAY:
            delayed.append(edge)
            new_edge = -1
            continue
        elif c == END:
            front_next[front_prev[prev]] = front_next[nxt]
            front_prev[front_next[nxt]] = front_prev[prev]
            opposite = front_v0[prev]
            front_v0[prev] = -1
            front_v0[nxt] = -1
            new_edge = -1
        else:
            raise ValueError(f"invalid CLER symbol {c}")

        if v1 >= nvert or v0 >= nvert or opposite >= nvert:
            raise ValueError("topological error")
        faces[start] = v1
        faces[start + 1] = v0
        faces[start + 2] = opposite
        start += 3

    return vertex_count, cler


# ---------------------------------------------------------------------------
# Attributes
# ---------------------------------------------------------------------------


def _attr_decode(a: CortoAttribute, s: CortoInStream, nvert: int) -> None:
    if a.codec == NORMAL_CODEC:
        a.prediction = s.u8()
        a.values = s.decode_array(2, nvert)
        return
    if a.codec == COLOR_CODEC:
        a.qc = [s.u8() for _ in range(4)]
    if a.strategy & CORRELATED:
        a.values = s.decode_array(a.components, nvert)
    else:
        a.values = s.decode_values(a.components, nvert)


def _attr_delta_decode(a: CortoAttribute, nvert: int, prediction) -> None:
    v = a.values
    if a.codec == NORMAL_CODEC and a.prediction != PRED_DIFF:
        return
    if prediction is not None:
        if a.codec != NORMAL_CODEC and (a.strategy & PARALLEL):
            for i in range(1, nvert):
                fa, fb, fc = prediction[i]
                v[i] += v[fa] + v[fb] - v[fc]
        else:
            for i in range(1, nvert):
                v[i] += v[prediction[i][0]]
    else:  # point cloud
        for i in range(1, nvert):
            v[i] += v[i - 1]


def _attr_post_delta(a, nvert, nface, attrs, faces) -> None:
    if a.codec != NORMAL_CODEC or a.prediction == PRED_DIFF:
        return
    coord = attrs.get("position")
    if coord is None:
        raise ValueError("normal estimation requires position attribute")
    est = _estimate_normals(coord.values.astype(np.float64), faces.reshape(-1, 3))
    if a.prediction == PRED_BORDER:
        boundary = np.zeros(nvert, np.int64)
        f = faces.reshape(-1, 3)
        np.add.at(boundary, f[:, 0], 0)  # placeholder; xor below
        for tri in f:
            boundary[tri[0]] ^= tri[1] ^ tri[2]
            boundary[tri[1]] ^= tri[2] ^ tri[0]
            boundary[tri[2]] ^= tri[0] ^ tri[1]
        mask = boundary != 0
    else:
        mask = np.ones(nvert, bool)
    out = np.zeros((nvert, 3), np.float64)
    count = 0
    for i in range(nvert):
        if mask[i]:
            o = _to_octa_float(est[i])
            corr = a.values[count] if a.prediction == PRED_BORDER else a.values[i]
            # JS Int32Array truncates after the add (corto.ts toOcta)
            s_ = int(corr[0] + o[0] * a.q)
            t_ = int(corr[1] + o[1] * a.q)
            out[i] = _to_sphere(s_, t_, a.q)
            count += 1
        else:
            n = est[i]
            norm = np.linalg.norm(n)
            out[i] = n / norm if norm else (0, 0, 1)
    a.values = out
    a.prediction = -1  # mark as materialized


def _attr_dequantize(a: CortoAttribute, nvert: int) -> np.ndarray:
    if a.codec == NORMAL_CODEC:
        if a.prediction == -1:  # already float normals from postDelta
            return a.values.astype(np.float32)
        out = np.zeros((nvert, 3), np.float32)
        for i in range(nvert):
            out[i] = _to_sphere(int(a.values[i, 0]), int(a.values[i, 1]), a.q)
        return out
    if a.codec == COLOR_CODEC:
        qc = a.qc
        v = a.values
        out = np.zeros((nvert, 4), np.uint8)
        e0, e1, e2, e3 = v[:, 0], v[:, 1], v[:, 2], v[:, 3]
        out[:, 0] = ((e2 + e0) * qc[0]) & 0xFF
        out[:, 1] = (e0 * qc[1]) & 0xFF
        out[:, 2] = ((e1 + e0) * qc[2]) & 0xFF
        out[:, 3] = (e3 * qc[3]) & 0xFF
        return out
    if a.format in (FMT_FLOAT, FMT_DOUBLE):
        return (a.values * a.q).astype(np.float32)
    return (a.values * a.q).astype(np.int64)


def _estimate_normals(coords: np.ndarray, faces: np.ndarray) -> np.ndarray:
    est = np.zeros((len(coords), 3), np.float64)
    a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
    n = np.cross(coords[b] - coords[a], coords[c] - coords[a])
    np.add.at(est, a, n)
    np.add.at(est, b, n)
    np.add.at(est, c, n)
    return est


def _to_octa_float(n):
    """Octahedral (u, v) in [-1, 1] floats (quantization applied by caller)."""
    length = abs(n[0]) + abs(n[1]) + abs(n[2])
    if length == 0:
        return 0.0, 0.0
    p0 = n[0] / length
    p1 = n[1] / length
    if n[2] < 0:
        ap0, ap1 = abs(p0), abs(p1)
        p0n = (1.0 - ap1) if n[0] >= 0 else (ap1 - 1.0)
        p1n = (1.0 - ap0) if n[1] >= 0 else (ap0 - 1.0)
        p0, p1 = p0n, p1n
    return p0, p1


def _to_octa(n, unit: float):
    p0, p1 = _to_octa_float(n)
    return int(p0 * unit), int(p1 * unit)


def _to_sphere(s_, t_, unit: float):
    x, y = float(s_), float(t_)
    z = unit - abs(x) - abs(y)
    if z < 0:
        x = (unit - abs(t_)) if s_ > 0 else (abs(t_) - unit)
        y = (unit - abs(s_)) if t_ > 0 else (abs(s_) - unit)
    v = np.asarray([x, y, z], np.float64)
    norm = np.linalg.norm(v)
    return v / norm if norm else np.asarray([0.0, 0.0, 1.0])
