import json

from uvol_tpu.containers.manifest import (
    load_manifest,
    manifest_for_directory,
    save_manifest,
    validate_v2_manifest,
)
from uvol_tpu.interfaces import (
    V1FrameData,
    V1Schema,
    V2Schema,
    is_v2_manifest,
    parse_manifest,
)


def _v2_dict():
    return {
        "version": "v2",
        "audio": {"path": "output/liam[ext]", "format": "mp3"},
        "geometry": {
            "targets": {"draco": {"frameRate": 30, "frameCount": 250, "format": "draco"}},
            "path": "output/geometry_[target]/[#####][ext]",
        },
        "texture": {
            "targets": {
                "ktx2-fps30-1k": {
                    "format": "ktx2",
                    "frameRate": 30,
                    "resolution": [1024, 1024],
                    "sequenceSize": 5,
                    "sequenceCount": 50,
                    "type": "baseColor",
                    "tag": "default",
                }
            },
            "path": "output/texture_[target]_[type]_[tag]/[#####][ext]",
        },
    }


def test_v2_roundtrip(tmp_path):
    m = parse_manifest(_v2_dict())
    assert isinstance(m, V2Schema)
    assert m.geometry.targets["draco"].frameCount == 250
    assert m.texture.targets["ktx2-fps30-1k"].sequenceSize == 5
    p = tmp_path / "uvol.json"
    save_manifest(m, str(p))
    m2 = load_manifest(str(p))
    assert m2.to_json() == m.to_json()
    # targets must be the Record form the player consumes, not a list
    d = json.loads(p.read_text())
    assert isinstance(d["texture"]["targets"], dict)


def test_v2_validation_ok():
    assert validate_v2_manifest(parse_manifest(_v2_dict())) == []


def test_v2_validation_rate_mismatch():
    d = _v2_dict()
    d["texture"]["targets"]["ktx2-fps30-1k"]["frameRate"] = 25  # 30/25 not integral
    problems = validate_v2_manifest(parse_manifest(d))
    assert any("not factors" in p for p in problems)


def test_v1_roundtrip():
    m = V1Schema(
        maxVertices=100,
        maxTriangles=50,
        frameRate=30,
        frameData=[
            V1FrameData(0, 0, 0, 100, 50, 1234),
            V1FrameData(1, 0, 1234, 90, 45, 1000),
        ],
    )
    d = m.to_json()
    assert not is_v2_manifest(d)
    m2 = parse_manifest(json.dumps(d))
    assert isinstance(m2, V1Schema)
    assert m2.frameData[1].startBytePosition == 1234


def test_manifest_for_directory(liam_output):
    d = manifest_for_directory(str(liam_output))
    m = parse_manifest(d)
    assert isinstance(m, V2Schema)
    assert m.geometry.targets["draco"].frameCount == 250
    t = m.texture.targets["ktx2-fps30-1k"]
    assert t.resolution == (1024, 1024)
    assert t.sequenceSize == 5
    assert t.sequenceCount == 50
    assert validate_v2_manifest(m) == []
