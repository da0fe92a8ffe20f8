"""CFF/OTF end-to-end coverage (VERDICT item 5).

The reference accepts .otf via ttf-parser (`/root/reference/src/render/
renderer.rs:109-111`, `src/commands/recurse.rs:106-108`); here CFF
outlines flow through the fontTools pen fallback (the native glyf
parser and the vectorized cores only exist for TrueType). A TTF/OTF
twin pair with identical outlines must produce identical metrics AND
identical SDF bitmaps.
"""

import io
import os

import numpy as np
import pytest

from versatiles_glyphs_tpu.font.entry import FontFileEntry
from versatiles_glyphs_tpu.render.driver import Renderer
from versatiles_glyphs_tpu.utils.synth_font import build_otf, build_ttf

N_GLYPHS = 12
FIRST_CP = 65


@pytest.fixture(scope="module")
def twins():
    ttf = FontFileEntry(build_ttf(N_GLYPHS, FIRST_CP, family="Twin Sans"))
    otf = FontFileEntry(build_otf(N_GLYPHS, FIRST_CP, family="Twin Sans"))
    return ttf, otf


def test_otf_uses_pen_fallback(twins):
    ttf, otf = twins
    # CFF fonts have no glyf table: no native fast path, no cores.
    assert otf._glyf_raw is None
    assert otf.prep_cores is None
    assert otf._native_rings is None
    # The TTF twin does get the fast paths (when the native lib built).
    from versatiles_glyphs_tpu.proto import native

    if native.available():
        assert ttf.prep_cores is not None


def test_otf_metadata(twins):
    _, otf = twins
    md = otf.metadata
    assert md.family == "Twin Sans"
    assert md.codepoints == list(range(FIRST_CP, FIRST_CP + N_GLYPHS))
    assert otf.units_per_em == 1000


def test_otf_metrics_match_ttf(twins):
    ttf, otf = twins
    r = Renderer("zeros")
    for cp in range(FIRST_CP, FIRST_CP + N_GLYPHS):
        pt = r.prep_glyph(ttf, cp)
        po = r.prep_glyph(otf, cp)
        assert (pt.advance, pt.empty) == (po.advance, po.empty)
        assert (pt.x0, pt.y0, pt.x1, pt.y1) == (po.x0, po.y0, po.x1, po.y1)
        assert (pt.pbf_width, pt.pbf_height, pt.pbf_left, pt.pbf_top) == (
            po.pbf_width, po.pbf_height, po.pbf_left, po.pbf_top,
        )


def test_otf_bitmaps_match_ttf_exact(twins):
    ttf, otf = twins
    r = Renderer("exact")
    for cp in range(FIRST_CP, FIRST_CP + N_GLYPHS):
        pt = r.prep_glyph(ttf, cp)
        po = r.prep_glyph(otf, cp)
        if pt.empty:
            assert po.empty
            continue
        bt, bo = r.render_bitmaps([pt, po], parallel=False)
        np.testing.assert_array_equal(bt, bo)


def test_otf_winding_hole(twins):
    # Glyph g1 (cp 66) has a square hole: inside-outline bytes ≥ 192 on
    # the outer ring interior, and the hole interior must be outside
    # (< 192 at its center) — exercises CFF ring orientation through
    # the whole winding path.
    _, otf = twins
    r = Renderer("exact")
    p = r.prep_glyph(otf, 66)
    (bm,) = r.render_bitmaps([p], parallel=False)
    img = np.asarray(bm).reshape(p.height, p.width)
    # glyph pixel space: outline occupies [50, 50+s]×[0, s] font units
    # scaled by 24/1000; find the bitmap center row/col.
    cy, cx = p.height // 2, p.width // 2
    assert img[cy, cx] < 192  # hole center: outside the filled area


def test_otf_cli_end_to_end(tmp_path):
    from versatiles_glyphs_tpu.cli import main

    otf_path = tmp_path / "twin.otf"
    otf_path.write_bytes(build_otf(N_GLYPHS, FIRST_CP, family="Twin Sans"))
    out_dir = tmp_path / "out"
    buf = io.StringIO()
    main(
        ["merge", str(otf_path), "-o", str(out_dir), "--renderer", "exact"],
        stdout=buf,
    )
    files = os.listdir(out_dir / "twin_sans_regular")
    assert files == ["0-255.pbf"]

    dbg = io.StringIO()
    main(["debug", str(out_dir / "twin_sans_regular")], stdout=dbg)
    rows = dbg.getvalue().strip().splitlines()
    assert len(rows) == 1 + N_GLYPHS
    # Same rows as the TTF twin rendered through the fast path.
    ttf_path = tmp_path / "twin.ttf"
    ttf_path.write_bytes(build_ttf(N_GLYPHS, FIRST_CP, family="Twin Sans"))
    out2 = tmp_path / "out2"
    main(
        ["merge", str(ttf_path), "-o", str(out2), "--renderer", "exact"],
        stdout=io.StringIO(),
    )
    dbg2 = io.StringIO()
    main(["debug", str(out2 / "twin_sans_regular")], stdout=dbg2)
    assert dbg.getvalue() == dbg2.getvalue()


def test_recurse_scans_otf(tmp_path):
    from versatiles_glyphs_tpu.cli import main

    (tmp_path / "fonts").mkdir()
    (tmp_path / "fonts" / "a.otf").write_bytes(
        build_otf(4, 65, family="Scan Serif")
    )
    out_dir = tmp_path / "out"
    main(
        ["recurse", str(tmp_path / "fonts"), "-o", str(out_dir), "--dummy"],
        stdout=io.StringIO(),
    )
    assert (out_dir / "scan_serif_regular" / "0-255.pbf").exists()
