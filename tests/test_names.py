"""Name parsing spec: the reference's 243-sample table
(`src/font/parse_font_name.rs:331-576`) extracted to
tests/data/font_name_cases.txt, plus generate_name / name_to_id."""

import os

import pytest

from versatiles_glyphs_tpu.font.names import (
    find_weight,
    generate_name,
    name_to_id,
    parse_font_name,
)

_CASES = []
with open(os.path.join(os.path.dirname(__file__), "data", "font_name_cases.txt")) as f:
    for line in f:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        fam, ps, ef, es, ew, ewd = line.split(";")
        _CASES.append((fam, ps, ef, es, int(ew), ewd))


def test_case_table_complete():
    assert len(_CASES) == 243


@pytest.mark.parametrize("fam,ps,ef,es,ew,ewd", _CASES)
def test_parse_font_name_table(fam, ps, ef, es, ew, ewd):
    assert parse_font_name(fam, ps) == (ef, es, ew, ewd)


def test_doc_example():
    assert parse_font_name(
        "Open Sans SemiCondensed Light", "OpenSansSemiCondensed-LightItalic"
    ) == ("Open Sans", "italic", 300, "semi-condensed")


def test_find_weight():
    assert find_weight("thin") == 100
    assert find_weight("hairline") == 100
    assert find_weight("extralight") == 200
    assert find_weight("light") == 300
    assert find_weight("book") == 400
    assert find_weight("medium") == 500
    assert find_weight("semibold") == 600
    assert find_weight("demibold") == 600
    assert find_weight("bold") == 700
    assert find_weight("extrabold") == 800
    assert find_weight("ultrabold") == 800
    assert find_weight("black") == 900
    assert find_weight("heavy") == 900
    assert find_weight("whatever") == 400


def test_generate_name():
    assert generate_name("Noto Sans", "normal", 400, "normal") == "Noto Sans Regular"
    assert (
        generate_name("Noto Sans", "italic", 700, "condensed")
        == "Noto Sans condensed Bold italic"
    )
    assert generate_name("X", "normal", 123, "normal") == "X Unknown"


def test_name_to_id():
    assert name_to_id("Fira Sans Regular") == "fira_sans_regular"
    assert name_to_id("  Foo--Bar__ Baz ") == "foo_bar_baz"
    assert name_to_id("Noto Sans-Bold") == "noto_sans_bold"
