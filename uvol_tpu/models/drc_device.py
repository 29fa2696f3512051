"""Device-side stages for REAL `.drc` decode: batched dequantize +
octahedral-normal reconstruction (round-1 verdict item 4).

Split of labor, measured on this hardware:

  - the wire stages (rANS entropy, Edgebreaker connectivity, prediction
    integration) are depth-N sequential recurrences — each value's
    parallelogram parents are typically the immediately preceding data
    ids, so there is no wide wavefront to map onto the VPU; a
    `lax.scan` formulation exists but is latency-bound (~µs x 27k
    steps) and its compile did not complete within a 10-minute budget
    on this environment's remote AOT compiler. These stages stay in C
    (native/draco_frame.cpp, GIL-free — they pool across cores on real
    hosts).
  - everything AFTER prediction is pure per-value math: quantized int →
    float dequantize and octahedral ints → unit normals. Those stages
    batch across frames as ONE jitted program here, outputs staying
    device-resident for the renderer/model (the north star's "decode
    back on TPU to identical vertex buffers").

`decode_drc_batch` = host portable decode (threaded, C) + device batch
conversion. Parity vs the all-host path is exact for integer stages by
construction and ≤1e-5 relative for the float stages (f32 device math vs
the C path's f64 accumulate; tests/test_drc_device.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from uvol_tpu.codecs.draco import constants as K


@dataclasses.dataclass
class DeviceFrameBatch:
    """Batched device tensors for N decoded `.drc` frames (padded)."""

    counts: Dict[int, np.ndarray]  # att_type -> [F] valid value counts
    values: Dict[int, Any]  # att_type -> [F, Nmax, C] device float32
    faces: List[np.ndarray]  # per-frame [M, 3] int32 (host)
    num_points: List[int]


def _dequant_fns():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def dequantize(ints, mins, scale):  # [F,N,C] i16/i32, [F,C], [F]
        return mins[:, None, :] + ints.astype(jnp.float32) * scale[:, None, None]

    @jax.jit
    def oct_to_unit(st, max_value):  # [F,N,2] i32, [F] f32
        u = st[..., 0].astype(jnp.float32) / max_value[:, None] * 2.0 - 1.0
        v = st[..., 1].astype(jnp.float32) / max_value[:, None] * 2.0 - 1.0
        z = 1.0 - jnp.abs(u) - jnp.abs(v)
        neg = z < 0
        su = jnp.where(u >= 0, 1.0, -1.0)
        sv = jnp.where(v >= 0, 1.0, -1.0)
        u2 = jnp.where(neg, (1.0 - jnp.abs(v)) * su, u)
        v2 = jnp.where(neg, (1.0 - jnp.abs(u)) * sv, v)
        nrm = jnp.sqrt(u2 * u2 + v2 * v2 + z * z)
        dn = jnp.maximum(nrm, 1e-30)
        out = jnp.stack([u2 / dn, v2 / dn, z / dn], axis=-1)
        return jnp.where(
            (nrm == 0)[..., None], jnp.asarray([0.0, 0.0, 1.0]), out
        )

    return dequantize, oct_to_unit


_FNS = None


def decode_drc_batch(
    blobs: Sequence[bytes],
    *,
    workers: int = 8,
    as_numpy: bool = False,
) -> DeviceFrameBatch:
    """Real `.drc` frames → device-resident float attribute batches.

    Host phase: portable native decode per frame (thread pool — the C
    loops release the GIL). Device phase: one jitted dequantize /
    oct→unit program per attribute type over the [F, Nmax, C] batch.
    """
    global _FNS
    import jax
    import jax.numpy as jnp

    from uvol_tpu import native

    def host_one(blob):
        res = native.drc_decode_native(blob, portable=True)
        if res is None:
            raise NotImplementedError(
                "stream outside the native fast path; use decode_drc"
            )
        return res

    if len(blobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(workers, len(blobs))) as pool:
            frames = list(pool.map(host_one, blobs))
    else:
        frames = [host_one(b) for b in blobs]

    if _FNS is None:
        _FNS = _dequant_fns()
    return _build_batch(frames, as_numpy=as_numpy)


_FUSED_CACHE: Dict = {}


def _fused_batch_fn(key):
    """One jitted program converting the PACKED upload buffer into every
    attribute's device tensor: a single host->device transfer + a single
    dispatch per window. The earlier per-attribute uploads (ints, mins,
    scales x 3 attribute types = ~9 small transfers) each paid this
    tunnel's ~20-30 ms roundtrip — the pipelined wire->device path spent
    more time issuing uploads than decoding (BENCH_r03 9.2 fps)."""
    import jax
    import jax.numpy as jnp

    specs = key[0]  # tuple of (att_type, kind, f, nmax, nc, off, mlen, moff)

    @jax.jit
    def run(packed, meta):
        outs = []
        for _t, kind, f, nmax, nc, off, _ml, moff in specs:
            ints = packed[off : off + f * nmax * nc].reshape(f, nmax, nc)
            if kind == 1:
                mins = meta[moff : moff + f * nc].reshape(f, nc)
                scale = meta[moff + f * nc : moff + f * nc + f]
                outs.append(
                    mins[:, None, :]
                    + ints.astype(jnp.float32) * scale[:, None, None]
                )
            else:  # octahedral normals
                maxv = meta[moff : moff + f]
                u = ints[..., 0].astype(jnp.float32) / maxv[:, None] * 2.0 - 1.0
                v = ints[..., 1].astype(jnp.float32) / maxv[:, None] * 2.0 - 1.0
                z = 1.0 - jnp.abs(u) - jnp.abs(v)
                neg = z < 0
                su = jnp.where(u >= 0, 1.0, -1.0)
                sv = jnp.where(v >= 0, 1.0, -1.0)
                u2 = jnp.where(neg, (1.0 - jnp.abs(v)) * su, u)
                v2 = jnp.where(neg, (1.0 - jnp.abs(u)) * sv, v)
                nrm = jnp.sqrt(u2 * u2 + v2 * v2 + z * z)
                dn = jnp.maximum(nrm, 1e-30)
                out = jnp.stack([u2 / dn, v2 / dn, z / dn], axis=-1)
                outs.append(
                    jnp.where(
                        (nrm == 0)[..., None],
                        jnp.asarray([0.0, 0.0, 1.0]),
                        out,
                    )
                )
        return tuple(outs)

    return run


def _build_batch(frames, *, as_numpy: bool = False) -> "DeviceFrameBatch":
    """Native-decoded frame tuples → padded device batches (shared by
    decode_drc_batch and the pipelined decode_drc_stream). All device
    attributes ride ONE packed upload + ONE fused dispatch."""
    import jax
    import jax.numpy as jnp

    f = len(frames)
    by_type: Dict[int, List] = {}
    faces = []
    num_points = []
    for num_faces, npts, poc, attrs in frames:
        faces.append(poc.reshape(-1, 3).astype(np.int32))
        num_points.append(int(npts))
        for a in attrs:
            by_type.setdefault(a[0], []).append(a)

    counts: Dict[int, np.ndarray] = {}
    values: Dict[int, Any] = {}
    specs = []  # (att_type, kind, f, nmax, nc, off, mlen, moff)
    chunks: List[np.ndarray] = []
    metas: List[np.ndarray] = []
    off = moff = 0
    use_i32 = False
    for att_type, entries in sorted(by_type.items()):
        if len(entries) != f:
            raise ValueError(
                f"attribute type {att_type} appears in {len(entries)} of "
                f"{f} frames; decode_drc_batch needs a uniform attribute "
                "set — decode mixed sequences per-frame with decode_drc"
            )
        kind = entries[0][7][0]
        if kind == 1:  # quantized → dequantize on device
            nc = entries[0][5].shape[1]
            nmax = max(e[5].shape[0] for e in entries)
            ints = np.zeros((f, nmax, nc), np.int32)
            mins = np.zeros((f, nc), np.float32)
            scale = np.zeros(f, np.float32)
            cnt = np.zeros(f, np.int64)
            for i, e in enumerate(entries):
                vals = e[5]
                cnt[i] = len(vals)
                ints[i, : len(vals)] = vals
                _k, bits, _mq, rng, mn = e[7]
                mins[i] = mn[:nc]
                scale[i] = rng / ((1 << bits) - 1)
            meta = np.concatenate([mins.reshape(-1), scale]).astype(
                np.float32
            )
        elif kind == 2:  # octahedral normals
            nc = 2
            nmax = max(e[5].shape[0] for e in entries)
            ints = np.zeros((f, nmax, 2), np.int32)
            maxv = np.zeros(f, np.float32)
            cnt = np.zeros(f, np.int64)
            for i, e in enumerate(entries):
                vals = e[5]
                cnt[i] = len(vals)
                ints[i, : len(vals)] = vals
                mq = e[7][2]
                q = 0
                while (1 << q) <= mq:
                    q += 1
                maxv[i] = float((1 << q) - 2)
            meta = maxv
        else:  # integer attrs: already final, keep host ints
            counts[att_type] = np.asarray(
                [len(e[5]) for e in entries], np.int64
            )
            values[att_type] = [e[5] for e in entries]
            continue
        if ints.max(initial=0) >= 2**15 or ints.min(initial=0) < -(2**15):
            use_i32 = True
        counts[att_type] = cnt
        specs.append(
            (att_type, kind, f, nmax, nc, off, len(meta), moff)
        )
        chunks.append(ints.reshape(-1))
        metas.append(meta)
        off += ints.size
        moff += len(meta)

    if specs:
        packed = np.concatenate(chunks)
        if not use_i32:
            packed = packed.astype(np.int16)
        meta_all = np.concatenate(metas) if metas else np.zeros(1, np.float32)
        key = (tuple(specs), use_i32)
        fn = _FUSED_CACHE.get(key)
        if fn is None:
            fn = _fused_batch_fn(key)
            _FUSED_CACHE[key] = fn
        outs = fn(jnp.asarray(packed), jnp.asarray(meta_all))
        for (att_type, *_rest), out in zip(specs, outs):
            values[att_type] = np.asarray(out) if as_numpy else out
        if not as_numpy:
            jax.block_until_ready(outs)
    return DeviceFrameBatch(
        counts=counts, values=values, faces=faces, num_points=num_points
    )


def decode_drc_stream(
    blobs: Sequence[bytes],
    *,
    window: int = 8,
    workers: int = 8,
    as_numpy: bool = False,
    lookahead: int = 2,
):
    """Pipelined wire→device decode (VERDICT r2 item 3's streaming form).

    The host C wire stages of window k+1..k+lookahead run on worker
    threads (GIL-free native loops) WHILE window k's tensors upload and
    dequantize on device — so on a multi-core host the sequential wire
    recurrences and the batched device math overlap instead of
    alternating, and device dispatch stays async (jit). Yields
    (start_index, DeviceFrameBatch) in order; per-window results are
    byte-identical to decode_drc_batch on the same slice
    (tests/test_drc_device.py).
    """
    global _FNS
    from concurrent.futures import ThreadPoolExecutor

    from uvol_tpu import native

    if _FNS is None:
        _FNS = _dequant_fns()

    def host_one(blob):
        res = native.drc_decode_native(blob, portable=True)
        if res is None:
            raise NotImplementedError(
                "stream outside the native fast path; use decode_drc"
            )
        return res

    starts = list(range(0, len(blobs), window))
    # `workers` threads decode individual frames, so within-window frames
    # run concurrently AND up to `lookahead` future windows stay in flight
    with ThreadPoolExecutor(max(1, workers)) as pool:
        inflight: dict = {}
        next_submit = 0
        for i, start in enumerate(starts):
            while next_submit < len(starts) and next_submit <= i + lookahead:
                s = starts[next_submit]
                inflight[next_submit] = [
                    pool.submit(host_one, blob)
                    for blob in blobs[s : s + window]
                ]
                next_submit += 1
            frames = [fut.result() for fut in inflight.pop(i)]
            # device dispatch is async: the upload/compute below overlaps
            # the already-running host decode of the next windows
            yield start, _build_batch(frames, as_numpy=as_numpy)
