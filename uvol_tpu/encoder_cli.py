"""Config-driven UVOL 2.0 sequence encoder CLI.

TPU-native replacement for scripts/Encoder.py: instead of one
draco_encoder/basisu subprocess per frame (reference :256-298), whole
sequences are encoded as batched device programs; outputs are
content-addressed per frame so re-runs resume for free (SURVEY.md §5
checkpoint/resume note).

Usage:
  python -m uvol_tpu.encoder_cli path/to/project-config.json
  python -m uvol_tpu.encoder_cli create-template [path]

Config fields mirror the reference template (scripts/Encoder.py:163-192):
ABCFilePath/OBJFilesPath/ImagesPath, OutputDirectory, name, frame rates,
quantization bits (Q_POSITION_ATTR etc.), KTX2_BATCH_SIZE, AudioURL.
JS-style comments are accepted (the reference uses commentjson).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from typing import Dict, List, Optional

import numpy as np

TEMPLATE = {
    "name": "sample",
    "OBJFilesPath": "./OBJ/[#####].obj",
    "ImagesPath": "./images/[#####].png",
    "OutputDirectory": "./output",
    "GEOMETRY_FRAME_RATE": 30,
    "TEXTURE_FRAME_RATE": 30,
    "KTX2_BATCH_SIZE": 5,
    "Q_POSITION_ATTR": 11,
    "Q_TEXTURE_ATTR": 10,
    "Q_NORMAL_ATTR": 8,
    "Q_GENERIC_ATTR": 8,
    "AudioURL": None,
    "TEXTURE_RESOLUTION": [1024, 1024],
}

_COMMENT_RE = re.compile(r"^\s*//.*$", re.M)


def load_config(path: str) -> Dict:
    text = open(path).read()
    text = _COMMENT_RE.sub("", text)  # commentjson-style // comments
    cfg = dict(TEMPLATE)
    cfg.update(json.loads(text))
    return cfg


def check_all_fields(cfg: Dict) -> List[str]:
    """Mandatory-field validation (reference scripts/Encoder.py:45-84)."""
    problems = []
    if not cfg.get("name"):
        problems.append("name is required")
    if not (cfg.get("OBJFilesPath") or cfg.get("ABCFilePath")):
        problems.append("one of OBJFilesPath/ABCFilePath is required")
    g, t = cfg["GEOMETRY_FRAME_RATE"], cfg["TEXTURE_FRAME_RATE"]
    if g % t != 0 and t % g != 0:
        problems.append(
            f"frame rates {g}/{t} are not factors of each other "
            "(reference warns at scripts/Encoder.py:368-373)"
        )
    return problems


def _expand(pattern: str) -> List[str]:
    from uvol_tpu.utils.paths import pattern_to_glob

    return sorted(glob.glob(pattern_to_glob(pattern)))


def load_obj(path: str):
    """Minimal OBJ reader: v/vt/f (triangulated)."""
    verts, uvs, faces = [], [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                uvs.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("f "):
                idx = [p.split("/")[0] for p in line.split()[1:]]
                idx = [int(i) - 1 for i in idx]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, np.float32)
    u = np.asarray(uvs, np.float32) if uvs else None
    if u is not None and len(u) != len(v):
        u = None  # per-corner UVs need seam handling; vertex UVs only here
    return v, u, np.asarray(faces, np.int32)


def load_image(path: str) -> np.ndarray:
    from PIL import Image  # pillow ships with the environment

    return np.asarray(Image.open(path).convert("RGB"))


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    if argv[0] == "create-template":
        out = argv[1] if len(argv) > 1 else "project-config.json"
        with open(out, "w") as f:
            json.dump(TEMPLATE, f, indent=2)
        print(f"wrote {out}")
        return 0

    cfg = load_config(argv[0])
    problems = check_all_fields(cfg)
    if problems:
        for p in problems:
            print(f"error: {p}")
        return 1

    out_dir = cfg["OutputDirectory"]
    name = cfg["name"]
    os.makedirs(out_dir, exist_ok=True)

    manifest: Dict = {
        "version": "v2",
        "geometry": {"targets": {}, "path": ""},
        "texture": {"targets": {}, "path": ""},
    }
    if cfg.get("AudioURL"):
        manifest["audio"] = {"path": cfg["AudioURL"], "format": "mp3"}

    # ---- geometry: whole-sequence batched encode ---------------------------
    n_geo = 0
    if cfg.get("OBJFilesPath"):
        from uvol_tpu.models.sequence import GeometryFrameSet, GeometrySequenceCodec

        objs = _expand(cfg["OBJFilesPath"])
        if not objs:
            print(f"error: no OBJ files match {cfg['OBJFilesPath']}")
            return 1
        frames = [load_obj(p) for p in objs]
        n_geo = len(frames)
        max_n = max(len(v) for v, _, _ in frames)
        F = len(frames)
        pos = np.zeros((F, max_n, 3), np.float32)
        uv = np.zeros((F, max_n, 2), np.float32)
        counts = np.zeros(F, np.int64)
        faces = []
        for i, (v, u, fidx) in enumerate(frames):
            pos[i, : len(v)] = v
            if u is not None:
                uv[i, : len(u)] = u
            counts[i] = len(v)
            faces.append(fidx)
        codec = GeometrySequenceCodec(
            position_bits=cfg["Q_POSITION_ATTR"], uv_bits=cfg["Q_TEXTURE_ATTR"]
        )
        blobs = codec.encode(GeometryFrameSet(pos, uv, counts, faces))
        geo_dir = os.path.join(out_dir, "geometry_uvtg")
        os.makedirs(geo_dir, exist_ok=True)
        for i, blob in enumerate(blobs):
            target = os.path.join(geo_dir, f"{i:05d}.drc")
            if not (os.path.exists(target) and os.path.getsize(target) == len(blob)):
                with open(target, "wb") as f:
                    f.write(blob)
        manifest["geometry"] = {
            "targets": {
                "uvtg": {
                    "frameRate": cfg["GEOMETRY_FRAME_RATE"],
                    "frameCount": n_geo,
                    "format": "draco",
                }
            },
            "path": "geometry_[target]/[#####][ext]",
        }
        print(f"geometry: {n_geo} frames -> {geo_dir}")

    # ---- texture: ETC blocks on device, KTX2_BATCH_SIZE layers per file ----
    if cfg.get("ImagesPath"):
        from uvol_tpu.models.sequence import TextureSequenceCodec

        imgs = _expand(cfg["ImagesPath"])
        if imgs:
            batch = cfg["KTX2_BATCH_SIZE"]
            codec = TextureSequenceCodec(sequence_size=batch)
            tex_dir = os.path.join(out_dir, "texture_etc-tpu_baseColor_default")
            os.makedirs(tex_dir, exist_ok=True)
            n_seg = 0
            for s in range(0, len(imgs), batch):
                chunk = imgs[s : s + batch]
                frames_px = np.stack([load_image(p) for p in chunk])
                blob = codec.encode_segment(frames_px)
                with open(os.path.join(tex_dir, f"{s // batch:05d}.ktx2"), "wb") as f:
                    f.write(blob)
                n_seg += 1
            h, w = frames_px.shape[1:3]
            manifest["texture"] = {
                "targets": {
                    "etc-tpu": {
                        "format": "ktx2",
                        "frameRate": cfg["TEXTURE_FRAME_RATE"],
                        "resolution": [w, h],
                        "sequenceSize": batch,
                        "sequenceCount": n_seg,
                        "type": "baseColor",
                        "tag": "default",
                    }
                },
                "path": "texture_[target]_[type]_[tag]/[#####][ext]",
            }
            print(f"texture: {n_seg} segments -> {tex_dir}")

    # ---- frame-count/rate cross-validation (reference :103-154) ------------
    from uvol_tpu.containers.manifest import save_manifest, validate_v2_manifest
    from uvol_tpu.interfaces import parse_manifest

    if manifest["texture"]["targets"]:
        m = parse_manifest(manifest)
        for p in validate_v2_manifest(m):
            print(f"warning: {p}")
        manifest_path = os.path.join(out_dir, f"{name}.uvol.json")
        save_manifest(m, manifest_path)
        print(f"manifest: {manifest_path}")
    else:
        manifest_path = os.path.join(out_dir, f"{name}.uvol.json")
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)
        print(f"manifest (geometry only): {manifest_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
