"""Encoder CLI end-to-end: config → real draco + ktx2 + manifest → player.

Guards the full L3 surface (reference scripts/Encoder.py) including the
manifest name (a texture-loop variable once clobbered it), content-addressed
resume, and the produced dataset being playable by the facade Player.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from uvol_tpu.encoder_cli import main as cli_main


def _make_assets(root, n_frames=6, tex=32):
    os.makedirs(f"{root}/OBJ", exist_ok=True)
    os.makedirs(f"{root}/images", exist_ok=True)
    r = np.random.default_rng(0)
    nx, ny = 5, 4
    for f in range(n_frames):
        with open(f"{root}/OBJ/{f:05d}.obj", "w") as fh:
            for i in range(nx):
                for j in range(ny):
                    fh.write(f"v {i} {j} {0.1 * f}\n")
            for i in range(nx):
                for j in range(ny):
                    fh.write(f"vt {i/(nx-1):.3f} {j/(ny-1):.3f}\n")
            idx = lambda i, j: i * ny + j + 1
            for i in range(nx - 1):
                for j in range(ny - 1):
                    a, b, c, d = (
                        idx(i, j), idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)
                    )
                    fh.write(f"f {a}/{a} {b}/{b} {c}/{c}\n")
                    fh.write(f"f {a}/{a} {c}/{c} {d}/{d}\n")
        img = (r.uniform(0, 1, (tex, tex, 3)) * 60 + 80).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/images/{f:05d}.png")
    cfg = {
        "name": "clitest",
        "OBJFilesPath": f"{root}/OBJ/[#####].obj",
        "ImagesPath": f"{root}/images/[#####].png",
        "OutputDirectory": f"{root}/output",
        "KTX2_BATCH_SIZE": 3,
        "ETC1S_ENDPOINTS": 16,
        "ETC1S_SELECTORS": 16,
        "ENCODE_WORKERS": 1,
    }
    path = f"{root}/config.json"
    json.dump(cfg, open(path, "w"))
    return path


def test_cli_end_to_end_and_resume(tmp_path):
    root = str(tmp_path)
    cfg = _make_assets(root)
    assert cli_main([cfg]) == 0
    out = f"{root}/output"
    # manifest named after the PROJECT, not a segment file
    assert os.path.exists(f"{out}/clitest.uvol.json")
    m = json.load(open(f"{out}/clitest.uvol.json"))
    assert m["geometry"]["targets"]["draco"]["format"] == "draco"
    assert "etc1s-tpu" in m["texture"]["targets"]

    # outputs are REAL draco bitstreams + BasisLZ ktx2
    from uvol_tpu.codecs.draco.decoder import decode_drc
    from uvol_tpu.containers.ktx2 import read_ktx2

    d = decode_drc(open(f"{out}/geometry_draco/00000.drc", "rb").read())
    assert d.num_points >= 20
    kf = read_ktx2(
        open(
            f"{out}/texture_etc1s-tpu_baseColor_default/00000.ktx2", "rb"
        ).read()
    )
    assert kf.header.supercompression_scheme == 1  # BasisLZ

    # content-addressed resume: second run rewrites nothing
    mt = os.path.getmtime(f"{out}/geometry_draco/00003.drc")
    mt_tex = os.path.getmtime(
        f"{out}/texture_etc1s-tpu_baseColor_default/00000.ktx2"
    )
    assert cli_main([cfg]) == 0
    assert os.path.getmtime(f"{out}/geometry_draco/00003.drc") == mt
    assert (
        os.path.getmtime(f"{out}/texture_etc1s-tpu_baseColor_default/00000.ktx2")
        == mt_tex
    )

    # the produced dataset plays through the facade Player
    from uvol_tpu.interfaces import PlayMode
    from uvol_tpu.player.clock import PlaybackClock, VirtualClock
    from uvol_tpu.player.facade import Player

    vc = VirtualClock()
    ended = []
    p = Player(
        play_mode=PlayMode.single,
        paths=[f"{out}/clitest.uvol.json"],
        on_track_end=lambda: ended.append(True),
        v2_player_kwargs={"clock": PlaybackClock(now=vc)},
    )
    p.set_track_path()
    ok = 0
    for _ in range(60):
        vc.advance(1 / 60)
        if p.update().status == "ok":
            ok += 1
        if ended:
            break
    assert ok > 5 and ended


def test_cli_uastc_texture_codec(tmp_path):
    """TEXTURE_CODEC=uastc produces Zstd/UASTC KTX2 segments the facade
    player plays (reference `basisu -uastc` mode)."""
    cfg_path = _make_assets(tmp_path, n_frames=3)
    cfg = json.load(open(cfg_path))
    cfg["TEXTURE_CODEC"] = "uastc"
    json.dump(cfg, open(cfg_path, "w"))
    assert cli_main([cfg_path]) == 0
    out = f"{tmp_path}/output"
    tex_dir = f"{out}/texture_uastc-tpu_baseColor_default"
    segs = sorted(f for f in os.listdir(tex_dir) if f.endswith(".ktx2"))
    assert segs == ["00000.ktx2"]
    from uvol_tpu.containers.ktx2 import KHR_DF_MODEL_UASTC, read_ktx2_file

    f = read_ktx2_file(f"{tex_dir}/00000.ktx2")
    assert f.dfd_color_model() == KHR_DF_MODEL_UASTC
    from uvol_tpu.player.v2 import default_texture_decoder

    frames = default_texture_decoder(open(f"{tex_dir}/00000.ktx2", "rb").read())
    assert frames.shape[0] == 3 and frames.shape[-1] == 4


def test_cli_multi_target_textures(tmp_path):
    """TEXTURE_CODEC="etc1s,uastc" publishes BOTH targets in the manifest
    Record (reference multi-target projects); the facade player then picks
    by TEXTURE_FORMAT_PRIORITY + device support."""
    cfg_path = _make_assets(tmp_path, n_frames=3)
    cfg = json.load(open(cfg_path))
    cfg["TEXTURE_CODEC"] = "etc1s,uastc"
    json.dump(cfg, open(cfg_path, "w"))
    assert cli_main([cfg_path]) == 0
    out = f"{tmp_path}/output"
    manifest = json.load(open(f"{out}/clitest.uvol.json"))
    targets = manifest["texture"]["targets"]
    assert set(targets) == {"etc1s-tpu", "uastc-tpu"}
    for name in targets:
        seg = f"{out}/texture_{name}_baseColor_default/00000.ktx2"
        assert os.path.exists(seg), seg
