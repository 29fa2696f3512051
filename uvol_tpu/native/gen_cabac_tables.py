"""Extract the H.264 CABAC constant tables from the system codec binaries.

Zero-egress environment: the spec text (ITU-T H.264 tables 9-12..9-33,
9-44, 9-45) is not available, but the values ship inside the in-image
codec binaries. This script locates them structurally and emits
`h264_cabac_tables.py` (committed, so the build never depends on the
.so layout):

- context init (m, n) pairs: libavcodec.so carries four consecutive
  [1024][2] int8 tables; the three with P-context rows populated are
  cabac_context_init_PB[cabac_init_idc], the one with zeros at contexts
  11..23 is cabac_context_init_I. Anchored on the context 0..10 values
  of Table 9-12 (mb_type I), which all four share.
- rangeTabLPS (Table 9-44): libx264.so stores it reversed (its state
  numbering is 2*(63 - pStateIdx) + valMPS, most-confident first); the
  anchor is the spec's state-0 row {128,176,208,240} which appears as
  the table's LAST row.
- transIdxLPS (Table 9-45): read off libx264's transition[128][2]
  (bin-indexed pairs in the same reversed numbering). The extraction
  cross-checks every state: MPS transitions must equal min(p+1, 62)
  (63 absorbing), valMPS must flip exactly at pState 0, and the odd
  (valMPS=1) states must mirror the even ones.

Every value is additionally validated behaviorally by the conformance
tests (tests/test_h264_cabac.py): our decoder must bit-exactly match
libavcodec on x264-encoded CABAC streams, which exercises all four
tables — a wrong entry anywhere desynchronizes the arithmetic decoder
within a few macroblocks.

Usage: python -m uvol_tpu.native.gen_cabac_tables [out.py]
"""

from __future__ import annotations

import sys

import numpy as np

AVCODEC = "/lib/x86_64-linux-gnu/libavcodec.so.59"
X264 = "/lib/x86_64-linux-gnu/libx264.so.164"

# Table 9-12 contexts 0..10 (mb_type I) — shared by all four init tables
_INIT_ANCHOR = [20, -15, 2, 54, 3, 74, 20, -15, 2, 54, 3, 74,
                -28, 127, -23, 104, -6, 53, -1, 54, 7, 51]


def _find_all(data: bytes, pat: bytes):
    offs, i = [], 0
    while True:
        j = data.find(pat, i)
        if j < 0:
            return offs
        offs.append(j)
        i = j + 1


def extract_context_init(path: str = AVCODEC):
    data = open(path, "rb").read()
    anchor = bytes(np.array(_INIT_ANCHOR, np.int8).view(np.uint8))
    offs = _find_all(data, anchor)
    tables = []
    for o in offs:
        blk = np.frombuffer(data[o:o + 2048], np.int8).reshape(1024, 2)
        tables.append(blk)
    if len(tables) != 4:
        raise RuntimeError(f"expected 4 init tables, found {len(tables)}")
    init_i = [t for t in tables if not t[11:24].any()]
    init_pb = [t for t in tables if t[11:24].any()]
    if len(init_i) != 1 or len(init_pb) != 3:
        raise RuntimeError("could not split init_I from init_PB")
    # identify idc order by the known mb_skip_flag P rows (Table 9-13)
    key = {(23, 33): 0, (22, 25): 1, (29, 16): 2}
    pb = [None] * 3
    for t in init_pb:
        pb[key[tuple(t[11])]] = t
    return init_i[0], pb


def extract_engine_tables(path: str = X264):
    data = open(path, "rb").read()
    # rangeTabLPS stored reversed: spec state-0 row is the LAST row
    tail = bytes([128, 176, 208, 240])
    offs = [o for o in _find_all(data, tail)
            if bytes([128, 167, 197, 227]) == data[o - 4:o]]
    if len(offs) != 1:
        raise RuntimeError(f"rangeTabLPS anchor hits: {offs}")
    end = offs[0] + 4
    lps_rev = np.frombuffer(data[end - 256:end], np.uint8).reshape(64, 4)
    range_lps = lps_rev[::-1].copy()
    # transition[128][2] directly precedes it
    trans = np.frombuffer(data[end - 512:end - 256], np.uint8).reshape(128, 2)
    t_lps = [0] * 64
    for k in range(64):
        p = 63 - k
        nb0, nb1 = int(trans[2 * k][0]), int(trans[2 * k][1])
        if 63 - (nb0 >> 1) != (min(p + 1, 62) if p != 63 else 63):
            raise RuntimeError(f"MPS transition mismatch at state {p}")
        if (nb1 & 1) != (1 if p == 0 else 0):
            raise RuntimeError(f"valMPS flip mismatch at state {p}")
        if (int(trans[2 * k + 1][0]) >> 1) != (nb1 >> 1):
            raise RuntimeError(f"odd-state mismatch at state {p}")
        t_lps[p] = 63 - (nb1 >> 1)
    return range_lps, t_lps


def main(out: str) -> None:
    init_i, init_pb = extract_context_init()
    range_lps, t_lps = extract_engine_tables()
    with open(out, "w") as fh:
        fh.write('"""H.264 CABAC constant tables (GENERATED — do not edit).\n\n')
        fh.write("Extracted from the in-image codec binaries by\n")
        fh.write("uvol_tpu/native/gen_cabac_tables.py (see its docstring for\n")
        fh.write("the provenance and the behavioral validation story).\n")
        fh.write('"""\n\nimport numpy as np\n\n')
        fh.write("# Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx]\n")
        fh.write(f"RANGE_LPS = np.array({range_lps.tolist()}, np.uint8)\n\n")
        fh.write("# Table 9-45: transIdxLPS (transIdxMPS is min(p+1, 62), 63->63)\n")
        fh.write(f"TRANS_LPS = np.array({t_lps}, np.uint8)\n\n")
        fh.write("# Tables 9-12..9-33: context init (m, n), 1024 contexts\n")
        fh.write(f"CTX_INIT_I = np.array({init_i.tolist()}, np.int8)\n\n")
        fh.write("CTX_INIT_PB = np.array([\n")
        for t in init_pb:
            fh.write(f"    {t.tolist()},\n")
        fh.write("], np.int8)\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "uvol_tpu/native/h264_cabac_tables.py")
