"""index.json / font_families.json formatting goldens
(`src/font/index_files.rs:144-211`)."""

import tests.conftest as C
from versatiles_glyphs_tpu.font.index_files import (
    build_font_families_json,
    build_index_json,
    encode_codeblocks,
)
from versatiles_glyphs_tpu.font.manager import FontManager


def test_encode_codeblocks():
    assert encode_codeblocks([]) == ""
    assert encode_codeblocks([0]) == "0"
    # 0x00-0x3F → blocks 0-3; 0x50-0x5F → 5; 0xA0-0xCF → A-C
    cps = list(range(0x40)) + list(range(0x50, 0x60)) + list(range(0xA0, 0xD0))
    assert encode_codeblocks(cps) == "0-3,5,A-C"
    assert encode_codeblocks([0xA20]) == "A2"


def test_index_json():
    m = FontManager()
    m.add_paths([C.FIRA, C.NOTO])
    out = build_index_json(m.fonts.keys()).decode()
    assert out.split("\n") == [
        "[",
        '  "fira_sans_regular",',
        '  "noto_sans_regular"',
        "]",
    ]


def test_families_json():
    m = FontManager()
    m.add_paths([C.FIRA, C.NOTO])
    out = build_font_families_json(m.fonts.items()).decode()
    lines = out.split("\n")
    assert lines[0] == "["
    assert lines[1] == "  {"
    assert lines[2] == '    "name": "Fira Sans",'
    assert lines[3] == '    "faces": ['
    assert lines[4] == "      {"
    assert lines[5] == '        "id": "fira_sans_regular",'
    assert lines[6] == '        "style": "normal",'
    assert lines[7] == '        "weight": 400,'
    assert lines[8] == '        "width": "normal",'
    # The Fira codeblocks golden from index_files.rs:184-197.
    assert lines[9] == (
        '        "codeblocks": "0,2-7,A-2E,30-52,E3,1D4,1D6-1D7,1D9,1DB-1DC,'
        "1E0-204,207-208,20A-20B,210-212,215,219,21E,220-222,224,226,22C,232,"
        '23C,25A,25C,2C6-2C7,A78,A7A-A7B,AB5,FB0,FEF"'
    )
