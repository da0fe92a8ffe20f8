"""Synthesized fonts built in-memory with fontTools.

Small, deterministic fixtures for pipeline tests and the multichip dry
run, independent of any on-disk testdata: a TrueType (glyf) font and a
CFF/OTF twin with identical outlines — the latter exercises the
fontTools pen fallback path (the reference handles .otf via ttf-parser,
`/root/reference/src/render/renderer.rs:109-111`).
"""

from __future__ import annotations

import io

from fontTools.fontBuilder import FontBuilder

UPEM = 1000
ASCENT = 800
DESCENT = -200


def _contours(k: int):
    """Deterministic outline for glyph #k: an outer square with a
    square hole (tests winding), size varying with k."""
    s = 100 + (k * 37) % 500  # outer size 100..599 font units
    m = s // 4
    outer = [(50, 0), (50 + s, 0), (50 + s, s), (50, s)]
    hole = [(50 + m, m), (50 + m, s - m), (50 + s - m, s - m), (50 + s - m, m)]
    return [outer, hole] if k % 3 else [outer]


def _glyph_names(n: int):
    return [f"g{k}" for k in range(n)]


def _cmap(n: int, first_cp: int):
    return {first_cp + k: f"g{k}" for k in range(n)}


def _metrics(n: int):
    out = {".notdef": (600, 0)}
    for k in range(n):
        s = 100 + (k * 37) % 500
        out[f"g{k}"] = (s + 100, 50)
    return out


def build_ttf(n_glyphs: int = 24, first_cp: int = 65, family: str = "Synth Sans") -> bytes:
    """A minimal TrueType font: n_glyphs square(+hole) glyphs mapped
    from ``first_cp``."""
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    names = _glyph_names(n_glyphs)
    fb = FontBuilder(UPEM, isTTF=True)
    fb.setupGlyphOrder([".notdef"] + names)
    fb.setupCharacterMap(_cmap(n_glyphs, first_cp))

    glyphs = {}
    pen = TTGlyphPen(None)
    glyphs[".notdef"] = pen.glyph()
    for k, name in enumerate(names):
        pen = TTGlyphPen(None)
        for contour in _contours(k):
            pen.moveTo(contour[0])
            for pt in contour[1:]:
                pen.lineTo(pt)
            pen.closePath()
        glyphs[name] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics(_metrics(n_glyphs))
    fb.setupHorizontalHeader(ascent=ASCENT, descent=DESCENT)
    fb.setupNameTable(
        {"familyName": family, "styleName": "Regular", "psName": family.replace(" ", "") + "-Regular"}
    )
    fb.setupOS2(sTypoAscender=ASCENT, sTypoDescender=DESCENT)
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue()


def build_ttf_split_cmap(
    n_glyphs: int = 6, first_cp: int = 65, family: str = "Split Sans"
) -> tuple[bytes, int]:
    """A TTF whose "best" cmap subtable misses a covered codepoint.

    The font carries two unicode subtables: a (3,1) format-4 mapping
    every glyph, and a (3,10) format-12 — the one `getBestCmap()`
    prefers — missing the LAST codepoint. The reference resolves
    lookups through the subtable union (ttf-parser `Face::glyph_index`;
    coverage: `/root/reference/src/font/metadata.rs:103-116`), so that
    codepoint must still render. Returns (font bytes, missing cp).
    """
    from fontTools.ttLib import TTFont
    from fontTools.ttLib.tables._c_m_a_p import CmapSubtable

    data = build_ttf(n_glyphs, first_cp, family)
    font = TTFont(io.BytesIO(data))
    full = _cmap(n_glyphs, first_cp)
    missing_cp = first_cp + n_glyphs - 1

    sub4 = CmapSubtable.getSubtableClass(4)(4)
    sub4.platformID, sub4.platEncID, sub4.language = 3, 1, 0
    sub4.cmap = dict(full)
    sub12 = CmapSubtable.getSubtableClass(12)(12)
    sub12.platformID, sub12.platEncID, sub12.language = 3, 10, 0
    sub12.cmap = {cp: n for cp, n in full.items() if cp != missing_cp}
    font["cmap"].tables = [sub4, sub12]

    buf = io.BytesIO()
    font.save(buf)
    return buf.getvalue(), missing_cp


def build_otf(n_glyphs: int = 24, first_cp: int = 65, family: str = "Synth Serif") -> bytes:
    """A CFF/OTF font with the same outlines as `build_ttf` — exercises
    the CFF (pen fallback) ingestion path end-to-end."""
    from fontTools.pens.t2CharStringPen import T2CharStringPen

    names = _glyph_names(n_glyphs)
    fb = FontBuilder(UPEM, isTTF=False)
    fb.setupGlyphOrder([".notdef"] + names)
    fb.setupCharacterMap(_cmap(n_glyphs, first_cp))

    metrics = _metrics(n_glyphs)
    charstrings = {}
    pen = T2CharStringPen(metrics[".notdef"][0], None)
    charstrings[".notdef"] = pen.getCharString()
    for k, name in enumerate(names):
        pen = T2CharStringPen(metrics[name][0], None)
        for contour in _contours(k):
            pen.moveTo(contour[0])
            for pt in contour[1:]:
                pen.lineTo(pt)
            pen.closePath()
        charstrings[name] = pen.getCharString()
    ps_name = family.replace(" ", "") + "-Regular"
    fb.setupCFF(ps_name, {"FullName": family}, charstrings, {})
    fb.setupHorizontalMetrics(metrics)
    fb.setupHorizontalHeader(ascent=ASCENT, descent=DESCENT)
    fb.setupNameTable(
        {"familyName": family, "styleName": "Regular", "psName": ps_name}
    )
    fb.setupOS2(sTypoAscender=ASCENT, sTypoDescender=DESCENT)
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue()


def build_otf2(n_glyphs: int = 24, first_cp: int = 65, family: str = "Synth Two") -> bytes:
    """A CFF2/OTF font with the same outlines as `build_ttf` — CFF2 has
    no native fast path (the reference handles it via ttf-parser,
    `renderer.rs:109-111`); here it exercises the pen-walked
    `FontFileEntry._pen_flat` route into the vectorized cores."""
    from fontTools.pens.t2CharStringPen import T2CharStringPen

    names = _glyph_names(n_glyphs)
    fb = FontBuilder(UPEM, isTTF=False)
    fb.setupGlyphOrder([".notdef"] + names)
    fb.setupCharacterMap(_cmap(n_glyphs, first_cp))

    metrics = _metrics(n_glyphs)
    charstrings = {}
    pen = T2CharStringPen(None, None, CFF2=True)
    charstrings[".notdef"] = pen.getCharString()
    for k, name in enumerate(names):
        pen = T2CharStringPen(None, None, CFF2=True)
        for contour in _contours(k):
            pen.moveTo(contour[0])
            for pt in contour[1:]:
                pen.lineTo(pt)
            pen.closePath()
        charstrings[name] = pen.getCharString()
    ps_name = family.replace(" ", "") + "-Regular"
    fb.setupCFF2(charstrings)
    fb.setupHorizontalMetrics(metrics)
    fb.setupHorizontalHeader(ascent=ASCENT, descent=DESCENT)
    fb.setupNameTable(
        {"familyName": family, "styleName": "Regular", "psName": ps_name}
    )
    fb.setupOS2(sTypoAscender=ASCENT, sTypoDescender=DESCENT)
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue()
