"""Re-master the reference's UVOL 2.0 liam dataset as UVOL 1.0 — headless.

Cross-generation transcode on real corpus data, every stage the
production path:

  geometry: real `.drc` frames → native Draco decode → Corto `.crt`
            encode → `.drcs` + `.manifest` (the V1 container pair)
  texture:  real BasisLZ `.ktx2` segments → golden transcode to RGB →
            baked frame counters → MJPEG samples in a spec-correct MP4

then plays the result through the facade Player (V1 branch: byte-range
fetch, Corto decode, counter-synced video texture).

  python examples/remaster_v1.py [workdir] [--frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LIAM = "/root/reference/example/public/liam/output"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/uvol_remaster_v1")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--tex-size", type=int, default=512)
    ap.add_argument("--entropy", choices=("cavlc", "cabac"),
                    default="cavlc")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from PIL import Image

    from uvol_tpu.codecs.corto.decoder import decode_crt
    from uvol_tpu.codecs.corto.encoder import encode_crt
    from uvol_tpu.codecs.draco import constants as K
    from uvol_tpu.codecs.draco.decoder import decode_drc
    from uvol_tpu.codecs.basis.transcoder import transcode_ktx2_etc1s
    from uvol_tpu.containers.drcs import DrcsWriter
    from uvol_tpu.containers.ktx2 import read_ktx2_file
    from uvol_tpu.io.video import encode_v1_texture_video
    from uvol_tpu.player.clock import PlaybackClock, VirtualClock
    from uvol_tpu.player.facade import Player

    n = args.frames
    t0 = time.perf_counter()

    # ---- geometry: .drc -> .crt -> .drcs -----------------------------------
    w = DrcsWriter(frame_rate=30)
    total_drc = total_crt = 0
    for i in range(n):
        drc = open(f"{LIAM}/geometry_draco/{i:05d}.drc", "rb").read()
        m = decode_drc(drc)
        pos = m.point_attribute(K.ATT_POSITION)
        uv = m.point_attribute(K.ATT_TEX_COORD)
        # match the source's quantization (draco qp11/qt10) so the size
        # comparison is apples-to-apples
        diag = float(np.linalg.norm(pos.max(0) - pos.min(0)))
        crt = encode_crt(
            pos, m.faces, uvs=uv,
            position_step=(diag if diag > 0 else 1.0) / (1 << 11),
            uv_step=1.0 / 1024,
        )
        w.add_frame(crt, vertices=m.num_points, faces=len(m.faces))
        total_drc += len(drc)
        total_crt += len(crt)
    drcs_path = os.path.join(args.workdir, "liam_v1.drcs")
    w.save(drcs_path)
    t_geo = time.perf_counter() - t0
    print(
        f"geometry: {n} frames draco->corto in {t_geo:.1f}s "
        f"({total_drc // 1024}KB .drc -> {total_crt // 1024}KB .crt)"
    )

    # ---- texture: .ktx2 -> RGB frames -> counter-baked MJPEG MP4 ------------
    t0 = time.perf_counter()
    frames_rgb = []
    seg = -1
    rgba = None
    for i in range(n):
        s, layer = divmod(i, 5)  # KTX2_BATCH_SIZE=5 in the liam corpus
        if s != seg:
            f = read_ktx2_file(
                f"{LIAM}/texture_ktx2-fps30-1k_baseColor_default/{s:05d}.ktx2"
            )
            rgba = np.asarray(transcode_ktx2_etc1s(f))
            seg = s
        img = rgba[layer][..., :3]
        if args.tex_size != img.shape[0]:
            img = np.asarray(
                Image.fromarray(img).resize(
                    (args.tex_size, args.tex_size), Image.BILINEAR
                )
            )
        frames_rgb.append(img)
    # real compressed H.264 with zero-motion P slices (gop 30) — the
    # wire form the reference's own V1 MP4 uses; counter strip stays
    # bit-exact (I_PCM / exact-skip only). --entropy cabac re-codes the
    # slices with Main-profile CABAC (~20% fewer bytes, same recon).
    mp4 = encode_v1_texture_video(
        frames_rgb, fps=30, codec="h264", qp=28, gop=30,
        entropy=args.entropy,
    )
    open(os.path.join(args.workdir, "liam_v1.mp4"), "wb").write(mp4)
    print(
        f"texture: {n} frames ktx2->h264(gop30)-mp4 in "
        f"{time.perf_counter() - t0:.1f}s ({len(mp4) // 1024}KB)"
    )

    # ---- play it back through the facade ------------------------------------
    vc = VirtualClock()
    ended = []
    p = Player(
        paths=[os.path.join(args.workdir, "liam_v1.manifest")],
        fetcher=lambda u: open(u, "rb").read(),
        on_track_end=lambda: ended.append(1),
        play_mode=__import__(
            "uvol_tpu.interfaces", fromlist=["PlayMode"]
        ).PlayMode.unmanaged,
        v1_player_kwargs={"clock": PlaybackClock(now=vc)},
    )
    p.set_track_path(os.path.join(args.workdir, "liam_v1.manifest"))
    assert p.v1_instance.video is not None, "mp4 not picked up"
    shown = 0
    t0 = time.perf_counter()
    for _ in range(3 * n + 30):
        r = p.update()
        if r is None or ended:
            break
        if r.status == "ok":
            assert r.geometry.nvert > 20000  # real liam-scale mesh
            shown += 1
        vc.advance(1 / 30)
    wall = time.perf_counter() - t0
    print(
        f"playback: {shown}/{n} frames (counter-synced) in {wall:.1f}s "
        f"= {shown / wall:.1f} fps"
    )
    ok = bool(ended) and shown >= n - 3
    print("OK" if ok else "DEGRADED")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
