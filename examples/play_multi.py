"""Play N concurrent streams of the real liam corpus headlessly.

The multi-stream serving story at the host layer (BASELINE's "8
concurrent streams" bar measures the device path in bench.py; this
drives the PLAYER path): N independent facade Players share one virtual
30 fps clock and are stepped round-robin — the model of one serving
process multiplexing several viewers. Each stream keeps its own prefetch
window, eviction cursor and texture segment state; the test of substance
is that streams never interfere (every stream plays every frame with no
skips on a virtual clock) and that aggregate throughput equals the
single-stream number (decode dominates; scheduling overhead ~0).

  python examples/play_multi.py [--streams 4] [--frames 120]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LIAM = "/root/reference/example/public/liam"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--frames", type=int, default=120,
                    help="frames per stream (default 120)")
    args = ap.parse_args()

    out = os.path.join(LIAM, "output")
    if not os.path.isdir(out):
        print(f"liam corpus not found at {out}", file=sys.stderr)
        return 1

    from uvol_tpu.containers.manifest import manifest_for_directory
    from uvol_tpu.interfaces import PlayMode
    from uvol_tpu.player.clock import PlaybackClock, VirtualClock
    from uvol_tpu.player.facade import Player

    manifest = manifest_for_directory(out)
    manifest_bytes = json.dumps(manifest).encode()

    def fetcher(url: str) -> bytes:
        if url == "/liam.uvol.json":
            return manifest_bytes
        return open(os.path.join(LIAM, url.lstrip("/")), "rb").read()

    streams = []
    for s in range(args.streams):
        vc = VirtualClock()
        p = Player(
            paths=["/liam.uvol.json"],
            fetcher=fetcher,
            play_mode=PlayMode.unmanaged,
            on_track_end=lambda: None,
            v2_player_kwargs={"clock": PlaybackClock(now=vc)},
        )
        streams.append({"player": p, "clock": vc, "shown": 0, "skipped": 0,
                        "last": -1})

    t0 = time.perf_counter()
    for st in streams:
        st["player"].set_track_path("/liam.uvol.json")
    live = list(streams)
    while live:
        for st in list(live):
            r = st["player"].update()
            if r is None:
                live.remove(st)
                continue
            if r.status == "ok" and r.geometry_frame != st["last"]:
                st["shown"] += 1
                st["last"] = r.geometry_frame
            elif r.status == "skipped":
                st["skipped"] += 1
            st["clock"].advance(1 / 30)
            if st["last"] >= args.frames - 1:
                live.remove(st)
    wall = time.perf_counter() - t0

    total = sum(st["shown"] for st in streams)
    skipped = sum(st["skipped"] for st in streams)
    per = total / args.streams
    print(
        f"{args.streams} streams x {args.frames} frames: "
        f"{total} shown ({skipped} skipped) in {wall:.1f}s = "
        f"{total / wall:.1f} fps aggregate, "
        f"{per / wall:.2f} fps/stream ({per / wall / 30:.2f}x real time each)"
    )
    ok = all(
        st["shown"] >= args.frames - 2 and st["skipped"] == 0
        for st in streams
    )
    print("OK" if ok else "DEGRADED")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
