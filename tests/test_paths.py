from uvol_tpu.utils.paths import (
    count_hash_char,
    expand_template,
    get_absolute_url,
    pad,
    pattern_to_glob,
    pattern_to_printf,
)


def test_pad():
    assert pad(7, 5) == "00007"
    assert pad(12345, 5) == "12345"
    assert pad(123456, 5) == "123456"  # longer than width passes through
    assert pad(0, 1) == "0"


def test_count_hash_char():
    assert count_hash_char("output/geometry/[#####][ext]") == 5
    assert count_hash_char("no-hash") == 0


def test_get_absolute_url():
    assert (
        get_absolute_url("https://x.test/a/b/liam.uvol.json", "output/geo/00001.drc")
        == "https://x.test/a/b/output/geo/00001.drc"
    )
    assert (
        get_absolute_url("/a/b/m.json", "http://cdn/abs.drc") == "http://cdn/abs.drc"
    )


def test_pattern_to_printf():
    assert pattern_to_printf("out/[#####][ext]") == "out/%05u[ext]"
    assert pattern_to_glob("out/[#####][ext]") == "out/*[ext]"


def test_expand_template_geometry():
    # matches V2 player URL construction (src/V2/player.ts:141-156)
    path = "output/geometry_[target]/[#####][ext]"
    assert (
        expand_template(path, index=3, target="draco", ext=".drc")
        == "output/geometry_draco/00003.drc"
    )


def test_expand_template_texture():
    path = "output/texture_[target]_[type]_[tag]/[#####][ext]"
    got = expand_template(
        path, index=42, target="ktx2-fps30-1k", type="baseColor", tag="default",
        ext=".ktx2",
    )
    assert got == "output/texture_ktx2-fps30-1k_baseColor_default/00042.ktx2"
