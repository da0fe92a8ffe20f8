"""Golden-bitmap tests — the SDF correctness spec.

Exact goldens from the reference's inline tests:
`src/render/renderer_precise.rs:95-135` (square digit art) and
`src/render/renderer.rs:175-287` (Fira Sans cps 32/65/96/230 metrics +
ASCII art).
"""

import numpy as np
import pytest

from versatiles_glyphs_tpu.ops.sdf_ref import render_sdf_exact
from versatiles_glyphs_tpu.render.metrics import prepare_glyph
from versatiles_glyphs_tpu.utils.bitmap_art import (
    bitmap_as_ascii_art,
    bitmap_as_digit_art,
)

SQUARE_DIGITS = [
    "30 38 42 43 43 43 43 42 38 30",
    "38 48 54 55 55 55 55 54 48 38",
    "42 54 65 68 68 68 68 65 54 42",
    "43 55 68 80 80 80 80 68 55 43",
    "43 55 68 80 93 93 80 68 55 43",
    "43 55 68 80 93 93 80 68 55 43",
    "43 55 68 80 80 80 80 68 55 43",
    "42 54 65 68 68 68 68 65 54 42",
    "38 48 54 55 55 55 55 54 48 38",
    "30 38 42 43 43 43 43 42 38 30",
]


def test_square_digit_art_golden():
    ring = np.array(
        [(1, 2), (5, 2), (5, 6), (1, 6), (1, 2)], dtype=np.float64
    )
    segs = np.concatenate([ring[:-1], ring[1:]], axis=1)
    bm = render_sdf_exact(segs, 10, 10, -2, -1)
    assert bitmap_as_digit_art(bm, 10) == SQUARE_DIGITS


def _render_glyph(entry, cp):
    name = entry.glyph_name(cp)
    rings = entry.outline_rings(name)
    prep = prepare_glyph(cp, rings, entry.units_per_em, entry.hor_advance(name))
    if prep.empty:
        return prep, None
    bm = render_sdf_exact(prep.segments, prep.width, prep.height, prep.x0, prep.y0)
    return prep, bm


def test_glyph_32_space(fira_entry):
    prep, bm = _render_glyph(fira_entry, 32)
    assert prep.empty
    assert (prep.pbf_width, prep.pbf_height, prep.pbf_left, prep.pbf_top) == (0, 0, 0, 0)
    assert prep.advance == 6
    assert bm is None


GLYPH_65_ART = [
    "            ░░░░░░░░░░░░░░░░            ",
    "          ░░░░▒▒▒▒▒▒▒▒▒▒░░░░░░          ",
    "        ░░░░▒▒▒▒▒▒▒▒▒▒▒▒▒▒░░░░          ",
    "        ░░░░▒▒▒▒▓▓▓▓▓▓▓▓▒▒▒▒░░░░        ",
    "        ░░░░▒▒▒▒▓▓▓▓▓▓▓▓▒▒▒▒░░░░        ",
    "      ░░░░▒▒▒▒▓▓▓▓▓▓▓▓▓▓▒▒▒▒░░░░        ",
    "      ░░░░▒▒▒▒▓▓▓▓▓▓▓▓▓▓▓▓▒▒▒▒░░░░      ",
    "      ░░░░▒▒▒▒▓▓▓▓▓▓▓▓▓▓▓▓▒▒▒▒░░░░      ",
    "      ░░▒▒▒▒▓▓▓▓▓▓▒▒▓▓▓▓▓▓▒▒▒▒░░░░      ",
    "    ░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░    ",
    "    ░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░    ",
    "    ░░░░▒▒▓▓▓▓▓▓▒▒▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░    ",
    "  ░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒▒▒▒▒▓▓▓▓▓▓▒▒░░░░    ",
    "  ░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░  ",
    "  ░░░░▒▒▒▒▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▒▒▒▒░░░░  ",
    "░░░░▒▒▒▒▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▓▒▒▒▒░░░░  ",
    "░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒▒▒▒▒▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░",
    "░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒▒▒▒▒▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░",
    "░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░",
    "░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░░░░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒░░",
    "░░▒▒▒▒▒▒▒▒▒▒▒▒▒▒░░░░░░░░▒▒▒▒▒▒▒▒▒▒▒▒▒▒░░",
    "░░▒▒▒▒▒▒▒▒▒▒▒▒░░░░  ░░░░░░▒▒▒▒▒▒▒▒▒▒░░░░",
    "░░░░░░░░░░░░░░░░░░    ░░░░░░░░░░░░░░░░░░",
]


def test_glyph_65_A(fira_entry):
    prep, bm = _render_glyph(fira_entry, 65)
    assert (prep.pbf_width, prep.pbf_height) == (14, 17)
    assert (prep.pbf_left, prep.pbf_top, prep.advance) == (0, -7, 13)
    assert len(bm) == (prep.pbf_width + 6) * (prep.pbf_height + 6)
    assert bitmap_as_ascii_art(bm, prep.width) == GLYPH_65_ART


GLYPH_96_ART = [
    "    ░░░░░░░░░░            ",
    "  ░░░░░░░░░░░░░░░░        ",
    "  ░░░░▒▒▒▒▒▒▒▒░░░░░░░░    ",
    "░░░░▒▒▒▒▒▒▒▒▒▒▒▒▒▒░░░░░░  ",
    "░░░░▒▒▒▒▓▓▓▓▓▓▒▒▒▒▒▒░░░░░░",
    "░░░░▒▒▓▓▓▓▓▓▓▓▓▓▒▒▒▒▒▒▒▒░░",
    "░░░░▒▒▒▒▒▒▓▓▓▓▓▓▓▓▓▓▒▒▒▒░░",
    "░░░░░░▒▒▒▒▒▒▒▒▒▒▓▓▒▒▒▒▒▒░░",
    "  ░░░░░░░░▒▒▒▒▒▒▒▒▒▒▒▒░░░░",
    "      ░░░░░░░░▒▒▒▒▒▒░░░░░░",
    "          ░░░░░░░░░░░░░░  ",
]


def test_glyph_96_grave(fira_entry):
    prep, bm = _render_glyph(fira_entry, 96)
    assert (prep.pbf_width, prep.pbf_height) == (7, 5)
    assert (prep.pbf_left, prep.pbf_top, prep.advance) == (0, -4, 7)
    assert bitmap_as_ascii_art(bm, prep.width) == GLYPH_96_ART


def test_glyph_230_ae_metrics(fira_entry):
    prep, bm = _render_glyph(fira_entry, 230)
    assert (prep.pbf_width, prep.pbf_height) == (19, 14)
    assert (prep.pbf_left, prep.pbf_top, prep.advance) == (0, -11, 19)
    art = bitmap_as_ascii_art(bm, prep.width)
    # First + last rows of the reference golden (renderer.rs:230-264).
    assert art[0] == "      ░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░░      "
    assert art[-1] == "        ░░░░░░░░░░░░░░░░  ░░░░░░░░░░░░░░░░        "
    assert len(art) == 20


@pytest.mark.parametrize("cp", [48, 64, 103, 124, 166])
def test_bitmap_saturation_contract(fira_entry, cp):
    """Every bitmap byte obeys the quantization contract: values exist
    on both saturation ends for typical glyphs and 192 marks the
    outline (render/mod.rs:45-48)."""
    prep, bm = _render_glyph(fira_entry, cp)
    if bm is None:
        return
    assert bm.min() >= 0 and bm.max() <= 255
    assert bm.max() >= 192  # interior reaches beyond the outline value
