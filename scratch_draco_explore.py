"""Exploratory parser for real Draco v2.2 edgebreaker streams (liam corpus)."""
import sys

sys.path.insert(0, "/root/repo")
from uvol_tpu.codecs.buffer import DecoderBuffer
from uvol_tpu.codecs.rans import RansBitDecoder, RansSymbolDecoder, rans_precision_bits
from uvol_tpu.codecs.symbol_coding import decode_symbols

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/example/public/liam/output/geometry_draco/00000.drc"
data = open(path, "rb").read()
print(f"file: {path} ({len(data)} bytes)")
buf = DecoderBuffer(data)

magic = buf.raw(5)
major, minor = buf.u8(), buf.u8()
enc_type, enc_method = buf.u8(), buf.u8()
flags = buf.u16()
print(f"magic={magic} ver={major}.{minor} type={enc_type} method={enc_method} flags={flags:#x}")

traversal_type = buf.u8()
num_encoded_vertices = buf.varint()
num_faces = buf.varint()
num_attribute_data = buf.u8()
num_encoded_symbols = buf.varint()
num_encoded_split_symbols = buf.varint()
print(f"traversal={traversal_type} verts={num_encoded_vertices} faces={num_faces} "
      f"attr_data={num_attribute_data} symbols={num_encoded_symbols} split_symbols={num_encoded_split_symbols}")

# hypothesis: topology split events inline
num_topology_splits = buf.varint()
print(f"num_topology_splits={num_topology_splits}")
last_source = 0
splits = []
for i in range(num_topology_splits):
    delta = buf.varint()
    source = last_source + delta
    delta2 = buf.varint()
    split = source - delta2
    last_source = source
    splits.append([source, split])
print("splits(source,split):", splits[:8])
if num_topology_splits:
    buf.start_bit_decoding(False)
    for s in splits:
        s.append(buf.get_bits(1))
    buf.end_bit_decoding()
    print("split edges:", [s[2] for s in splits[:16]])
print(f"pos after splits: {buf.pos:#x}")

# start faces: RAnsBitDecoder
start_face = RansBitDecoder(buf)
print(f"start_face prob_zero={start_face.prob_zero} buflen={len(start_face._buf)} pos={buf.pos:#x}")

# attribute seams: num_attribute_data × RAnsBitDecoder
seams = []
for i in range(num_attribute_data):
    d = RansBitDecoder(buf)
    seams.append(d)
    print(f"seam[{i}] prob_zero={d.prob_zero} buflen={len(d._buf)} pos={buf.pos:#x}")

# valence contexts: 6 × (varint num_symbols, DecodeSymbols)
ctx = []
for i in range(6):
    n = buf.varint()
    print(f"context[{i}] num_symbols={n} pos={buf.pos:#x}")
    if n > 0:
        syms = decode_symbols(n, 1, buf)
        import numpy as np
        u, c = np.unique(syms, return_counts=True)
        print(f"   decoded; histogram {dict(zip(u.tolist(), c.tolist()))} pos={buf.pos:#x}")
        ctx.append(syms)
    else:
        ctx.append(None)

total = sum(len(c) for c in ctx if c is not None)
print(f"total valence symbols {total} vs num_encoded_symbols {num_encoded_symbols}")
print(f"pos={buf.pos:#x} remaining={buf.remaining()}")
