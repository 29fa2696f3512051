"""End-to-end headless demo: encode a synthetic volumetric clip, play it.

The L8 app layer (reference: example/src/VolumetricPlayer.tsx drives the
facade Player in a rAF loop). Headless equivalent: generate a short
animated mesh+texture sequence, run the encoder CLI to produce a UVOL 2.0
dataset (real per-frame `.drc` + BasisLZ `.ktx2` + uvol.json manifest),
then play it back with the facade Player against a virtual clock, printing
per-frame statuses and the buffering/frame callbacks.

  python examples/demo.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_assets(root: str, n_frames: int = 12, tex: int = 64) -> str:
    os.makedirs(f"{root}/OBJ", exist_ok=True)
    os.makedirs(f"{root}/images", exist_ok=True)
    from PIL import Image

    r = np.random.default_rng(0)
    # a waving grid with per-corner UVs
    nx, ny = 9, 7
    for f in range(n_frames):
        with open(f"{root}/OBJ/{f:05d}.obj", "w") as fh:
            for i in range(nx):
                for j in range(ny):
                    z = 0.2 * np.sin(i * 0.7 + f * 0.4) * np.cos(j * 0.5)
                    fh.write(f"v {i} {j} {z:.4f}\n")
            for i in range(nx):
                for j in range(ny):
                    fh.write(f"vt {i/(nx-1):.4f} {j/(ny-1):.4f}\n")
            idx = lambda i, j: i * ny + j + 1
            for i in range(nx - 1):
                for j in range(ny - 1):
                    a, b, c, d = idx(i, j), idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)
                    fh.write(f"f {a}/{a} {b}/{b} {c}/{c}\n")
                    fh.write(f"f {a}/{a} {c}/{c} {d}/{d}\n")
        yy, xx = np.mgrid[0:tex, 0:tex]
        img = np.stack(
            [(xx * 4 + f * 8) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1
        ).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/images/{f:05d}.png")

    cfg = {
        "name": "demo",
        "OBJFilesPath": f"{root}/OBJ/[#####].obj",
        "ImagesPath": f"{root}/images/[#####].png",
        "OutputDirectory": f"{root}/output",
        "GEOMETRY_FRAME_RATE": 30,
        "TEXTURE_FRAME_RATE": 30,
        "KTX2_BATCH_SIZE": 4,
        "ETC1S_ENDPOINTS": 64,
        "ETC1S_SELECTORS": 64,
    }
    path = f"{root}/config.json"
    json.dump(cfg, open(path, "w"))
    return path


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/uvol_demo"
    cfg_path = make_assets(root)
    print("== encoding (real draco .drc + BasisLZ .ktx2) ==")
    from uvol_tpu.encoder_cli import main as encode_main

    rc = encode_main([cfg_path])
    if rc:
        return rc

    print("== playback (facade Player, virtual clock) ==")
    from uvol_tpu.interfaces import PlayMode
    from uvol_tpu.player.clock import PlaybackClock, VirtualClock
    from uvol_tpu.player.facade import Player

    vc = VirtualClock()
    shown = []
    player = Player(
        play_mode=PlayMode.single,
        paths=[f"{root}/output/demo.uvol.json"],
        on_frame_show=shown.append,
        on_mesh_buffering=lambda p: print(f"  buffering {p:.0%}"),
        on_track_end=lambda: print("  track ended"),
        v2_player_kwargs={"clock": PlaybackClock(now=vc)},
    )
    player.set_track_path()
    statuses = {}
    for tick in range(int(0.6 * 60) + 30):
        vc.advance(1 / 60)
        r = player.update()
        statuses[r.status] = statuses.get(r.status, 0) + 1
        if r.status == "ended":
            break
    print(f"  statuses: {statuses}")
    print(f"  frames shown: {sorted(set(shown))}")
    ok = statuses.get("ok", 0)
    print("DEMO", "PASSED" if ok > 10 else "FAILED", f"({ok} ok frames)")
    return 0 if ok > 10 else 1


if __name__ == "__main__":
    raise SystemExit(main())
