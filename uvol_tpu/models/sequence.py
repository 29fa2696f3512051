"""Frame-sequence codec models — the flagship TPU compute path.

Replaces the reference encoder's per-frame subprocess loop
(scripts/Encoder.py:256-298: one draco_encoder/basisu process per frame)
with whole-sequence batched array programs:

  - GeometrySequenceCodec: [F, N, 3/2] attribute batches → quantize →
    predict → zigzag on device (single jit), rANS entropy per frame on
    host (serialization is not math); decode reverses with a `vmap`ed scan.
  - TextureSequenceCodec: [F, H, W, 3] frames → ETC1/ETC2 blocks on device,
    KTX2 container with `sequenceSize` frames as layers (the reference's
    KTX2_BATCH_SIZE batching, scripts/Encoder.py:279-298).

Both shard the frame axis over a `jax.sharding.Mesh` (ICI data
parallelism; SURVEY.md §2.4) — the whole sequence is one XLA program per
stage instead of F processes.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uvol_tpu.codecs.buffer import DecoderBuffer, EncoderBuffer
from uvol_tpu.codecs.symbol_coding import decode_symbols, encode_symbols
from uvol_tpu.containers.ktx2 import (
    SUPERCOMPRESSION_NONE,
    KTX2File,
    KTX2Header,
    KTX2Level,
    write_ktx2,
)
from uvol_tpu.ops.prediction import delta_decode, delta_encode
from uvol_tpu.ops.quantize import (
    QuantizedAttr,
    dequantize,
    quantize,
    zigzag_decode,
    zigzag_encode,
)
from uvol_tpu.codecs.basis.etc import (
    blocks_to_image,
    decode_etc1_blocks,
    encode_etc1_blocks,
    image_to_blocks,
    pack_etc1_payload,
    unpack_etc1_payload,
)

#: magic for the TPU-native geometry frame format ("UVTG" = uvol-tpu geom)
UVTG_MAGIC = b"UVTG"
VK_FORMAT_ETC2_R8G8B8_UNORM_BLOCK = 147


@dataclasses.dataclass
class GeometryFrameSet:
    """Padded batch of frames plus per-frame validity counts."""

    positions: np.ndarray  # [F, N, 3] float32 (padded)
    uvs: Optional[np.ndarray]  # [F, N, 2]
    counts: np.ndarray  # [F] valid vertex count per frame
    faces: List[np.ndarray]  # per-frame [Mf, 3] int32


class GeometrySequenceCodec:
    """Batched quantize+predict+entropy codec for mesh attribute sequences."""

    def __init__(self, position_bits: int = 11, uv_bits: int = 10):
        self.position_bits = position_bits
        self.uv_bits = uv_bits

        @jax.jit
        def _encode_device(pos, uv, mask):
            qp = quantize(pos, position_bits, mask=mask)
            pos_syms = zigzag_encode(delta_encode(qp.values))
            out = {
                "pos_syms": pos_syms,
                "pos_min": qp.min_value,
                "pos_range": qp.range_value,
            }
            if uv is not None:
                qu = quantize(uv, uv_bits, mask=mask)
                out.update(
                    uv_syms=zigzag_encode(delta_encode(qu.values)),
                    uv_min=qu.min_value,
                    uv_range=qu.range_value,
                )
            return out

        @jax.jit
        def _decode_device(pos_syms, pos_min, pos_range, uv_syms, uv_min, uv_range):
            qpos = delta_decode(zigzag_decode(pos_syms))
            pos = dequantize(QuantizedAttr(qpos, pos_min, pos_range), position_bits)
            quv = delta_decode(zigzag_decode(uv_syms))
            uv = dequantize(QuantizedAttr(quv, uv_min, uv_range), uv_bits)
            return pos, uv

        self._encode_device = _encode_device
        self._decode_device = _decode_device

    # -- encode --------------------------------------------------------------
    def encode(self, frames: GeometryFrameSet) -> List[bytes]:
        """Returns one `.uvtg` blob per frame (device batch + host entropy)."""
        f, n, _ = frames.positions.shape
        mask = np.arange(n)[None, :] < frames.counts[:, None]
        dev = self._encode_device(
            jnp.asarray(frames.positions),
            jnp.asarray(frames.uvs) if frames.uvs is not None else None,
            jnp.asarray(mask),
        )
        dev = jax.tree.map(np.asarray, dev)

        blobs = []
        for i in range(f):
            count = int(frames.counts[i])
            out = EncoderBuffer()
            out.raw(UVTG_MAGIC)
            out.u8(1)  # version
            out.u8(self.position_bits)
            out.u8(self.uv_bits if frames.uvs is not None else 0)
            out.varint(count)
            faces = frames.faces[i]
            out.varint(len(faces))
            for c in range(3):
                out.f32(float(dev["pos_min"][i, c]))
            out.f32(float(dev["pos_range"][i]))
            encode_symbols(
                dev["pos_syms"][i, :count].reshape(-1), 3, out
            )
            if frames.uvs is not None:
                for c in range(2):
                    out.f32(float(dev["uv_min"][i, c]))
                out.f32(float(dev["uv_range"][i]))
                encode_symbols(dev["uv_syms"][i, :count].reshape(-1), 2, out)
            # connectivity: delta+zigzag coded indices (host; Edgebreaker is
            # the C++-native upgrade path, SURVEY.md §7 step 4)
            flat = faces.reshape(-1).astype(np.int64)
            deltas = np.diff(flat, prepend=0)
            syms = np.where(deltas >= 0, deltas * 2, -deltas * 2 - 1).astype(np.uint32)
            encode_symbols(syms, 1, out)
            blobs.append(out.getvalue())
        return blobs

    # -- decode --------------------------------------------------------------
    def decode(self, blobs: Sequence[bytes]) -> GeometryFrameSet:
        f = len(blobs)
        pos_syms, uv_syms, metas, faces_list = [], [], [], []
        counts = np.zeros(f, np.int64)
        max_n = 0
        for i, blob in enumerate(blobs):
            buf = DecoderBuffer(blob)
            if buf.raw(4) != UVTG_MAGIC:
                raise ValueError("not a UVTG frame")
            _ver = buf.u8()
            pbits = buf.u8()
            ubits = buf.u8()
            count = buf.varint()
            nfaces = buf.varint()
            counts[i] = count
            max_n = max(max_n, count)
            pmin = [buf.f32() for _ in range(3)]
            prange = buf.f32()
            ps = decode_symbols(count * 3, 3, buf).reshape(count, 3)
            meta = dict(pmin=pmin, prange=prange, pbits=pbits, ubits=ubits)
            us = None
            if ubits:
                umin = [buf.f32() for _ in range(2)]
                urange = buf.f32()
                us = decode_symbols(count * 2, 2, buf).reshape(count, 2)
                meta.update(umin=umin, urange=urange)
            idx_syms = decode_symbols(nfaces * 3, 1, buf)
            signed = np.where(idx_syms % 2 == 0, idx_syms // 2, -((idx_syms + 1) // 2))
            flat = np.cumsum(signed)
            faces_list.append(flat.reshape(nfaces, 3).astype(np.int32))
            pos_syms.append(ps)
            uv_syms.append(us)
            metas.append(meta)

        pos_batch = np.zeros((f, max_n, 3), np.uint32)
        uv_batch = np.zeros((f, max_n, 2), np.uint32)
        pmin = np.zeros((f, 3), np.float32)
        prange = np.zeros(f, np.float32)
        umin = np.zeros((f, 2), np.float32)
        urange = np.ones(f, np.float32)
        for i in range(f):
            c = int(counts[i])
            pos_batch[i, :c] = pos_syms[i]
            pmin[i] = metas[i]["pmin"]
            prange[i] = metas[i]["prange"]
            if uv_syms[i] is not None:
                uv_batch[i, :c] = uv_syms[i]
                umin[i] = metas[i]["umin"]
                urange[i] = metas[i]["urange"]
        pos, uv = self._decode_device(
            jnp.asarray(pos_batch), jnp.asarray(pmin), jnp.asarray(prange),
            jnp.asarray(uv_batch), jnp.asarray(umin), jnp.asarray(urange),
        )
        return GeometryFrameSet(
            positions=np.asarray(pos),
            uvs=np.asarray(uv),
            counts=counts,
            faces=faces_list,
        )


class TextureSequenceCodec:
    """ETC1S-free TPU texture path: ETC1/ETC2 block encode + KTX2 batching."""

    def __init__(self, sequence_size: int = 5):
        self.sequence_size = sequence_size

        @jax.jit
        def _encode(frames_u8):  # [L, H, W, 3]
            blocks = image_to_blocks(frames_u8)
            return jax.vmap(encode_etc1_blocks)(blocks)  # [L, nb, 2] uint32

        from functools import partial

        @partial(jax.jit, static_argnums=(1, 2))
        def _decode(words, h, w):  # [L, nb, 2]
            blocks = jax.vmap(decode_etc1_blocks)(words)
            return jax.vmap(lambda b: blocks_to_image(b, h, w))(blocks)

        self._encode = _encode
        self._decode = _decode

    def encode_segment(self, frames: np.ndarray) -> bytes:
        """[L, H, W, 3] uint8 → one `.ktx2` (layers = frames, ETC2 RGB)."""
        l, h, w, _ = frames.shape
        words = np.asarray(self._encode(jnp.asarray(frames)))
        payload = b"".join(pack_etc1_payload(words[i]) for i in range(l))
        header = KTX2Header(
            vk_format=VK_FORMAT_ETC2_R8G8B8_UNORM_BLOCK,
            type_size=1,
            pixel_width=w,
            pixel_height=h,
            pixel_depth=0,
            layer_count=l,
            face_count=1,
            level_count=1,
            supercompression_scheme=SUPERCOMPRESSION_NONE,
        )
        return write_ktx2(header, [KTX2Level(payload, len(payload))])

    def decode_segment(self, ktx2: KTX2File) -> np.ndarray:
        """KTX2 (ETC2 RGB layers) → [L, H, W, 3] uint8."""
        h = ktx2.header.pixel_height
        w = ktx2.header.pixel_width
        l = max(ktx2.header.layer_count, 1)
        per = (h // 4) * (w // 4) * 8
        data = ktx2.levels[0].data
        words = np.stack(
            [unpack_etc1_payload(data[i * per : (i + 1) * per]) for i in range(l)]
        )
        return np.asarray(self._decode(jnp.asarray(words), h, w))
