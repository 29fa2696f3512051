"""Play the reference's real liam dataset headlessly, end to end.

The L8 app layer against the *golden corpus*: 250 draco_encoder `.drc`
frames + 50 basisu BasisLZ/ETC1S `.ktx2` segments from
`/root/reference/example/public/liam/output/` (the dataset the reference's
React demo streams — example/src/App.tsx). The top-level `liam.uvol.json`
is a missing git-lfs blob in the reference checkout, so the manifest is
reconstructed from the directory layout first.

Every stage is the production path: facade Player → V2Player interval
prefetch → native Draco decode → BasisLZ transcode → per-frame
mesh+texture delivery on a virtual 30 fps clock.

  python examples/play_liam.py [--frames N] [--async]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LIAM = "/root/reference/example/public/liam"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=250,
                    help="stop after N geometry frames (default: all 250)")
    ap.add_argument("--async", dest="use_async", action="store_true",
                    help="decode through the worker pools (L5 services)")
    ap.add_argument("--rate", type=float, default=None,
                    help="async: frames advanced per WALL second (default "
                    "8; this host's single core decodes ~10-20 fps, so "
                    "realtime 30 would correctly skip most frames)")
    args = ap.parse_args()

    out = os.path.join(LIAM, "output")
    if not os.path.isdir(out):
        print(f"liam corpus not found at {out}", file=sys.stderr)
        return 1

    from uvol_tpu.containers.manifest import manifest_for_directory
    from uvol_tpu.player.clock import PlaybackClock, VirtualClock
    from uvol_tpu.player.facade import Player

    manifest = manifest_for_directory(out)
    n_frames = min(
        args.frames,
        next(iter(manifest["geometry"]["targets"].values()))["frameCount"],
    )

    files = {"/liam.uvol.json": json.dumps(manifest).encode()}

    def fetcher(url: str) -> bytes:
        if url in files:
            return files[url]
        # manifest-relative URL -> file under the liam root
        return open(os.path.join(LIAM, url.lstrip("/")), "rb").read()

    vc = VirtualClock()
    stats = {"shown": 0, "skipped": 0, "buffering": 0, "ended": False}
    # async mode: decode happens in worker pools in REAL time, so tick the
    # virtual clock at wall pace (like the reference's rAF); frames that
    # miss their slot are skipped — the reference's degradation semantics
    wall_paced = args.use_async
    wall_tick = 1.0 / (args.rate or 8.0)  # wall seconds per frame advance
    p = Player(
        paths=["/liam.uvol.json"],
        fetcher=fetcher,
        on_track_end=lambda: stats.__setitem__("ended", True),
        play_mode=__import__(
            "uvol_tpu.interfaces", fromlist=["PlayMode"]
        ).PlayMode.unmanaged,
        v2_player_kwargs={
            "clock": PlaybackClock(now=vc),
            "async_prefetch": args.use_async,
        },
    )
    t0 = time.perf_counter()
    p.set_track_path("/liam.uvol.json")

    last_frame = -1
    while not stats["ended"]:
        r = p.update()
        if r is None:
            break
        if r.status == "ok":
            if r.geometry_frame != last_frame:
                stats["shown"] += 1
                last_frame = r.geometry_frame
                if r.geometry_frame % 60 == 0:
                    mesh = r.geometry
                    print(
                        f"  frame {r.geometry_frame:3d}: {len(mesh.faces)} "
                        f"faces, {mesh.num_points} points, texture layer "
                        f"{r.texture_layer} of segment {r.texture_segment}"
                    )
        elif r.status == "skipped":
            stats["skipped"] += 1
        elif r.status == "buffering":
            stats["buffering"] += 1
        if last_frame >= n_frames - 1:
            break
        if wall_paced:
            time.sleep(wall_tick)  # slow-motion: decode keeps pace
        vc.advance(1 / 30)
    wall = time.perf_counter() - t0

    print(
        f"played {stats['shown']}/{n_frames} frames "
        f"({stats['skipped']} skipped ticks, {stats['buffering']} buffering) "
        f"in {wall:.1f}s wall = {stats['shown'] / wall:.1f} fps "
        f"({stats['shown'] / wall / 30:.1f}x real time)"
    )
    if wall_paced:
        # decode throughput on this host bounds what a 30 fps clock can show
        ok = stats["shown"] >= n_frames * 0.4
    else:
        ok = (
            stats["shown"] >= n_frames - 5
            and stats["skipped"] <= n_frames * 0.1
        )
    print("OK" if ok else "DEGRADED")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
