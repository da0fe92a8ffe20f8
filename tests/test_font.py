"""Font ingestion + orchestration tests: metadata known-answers, block
partitioning, and the full-pipeline dummy-renderer manifest golden
(`src/font/manager.rs:163-240` — exact file list + byte sizes for 4
fonts / 2 logical fonts / 59 entries)."""

import pytest

import tests.conftest as C
from versatiles_glyphs_tpu.font.manager import FontManager
from versatiles_glyphs_tpu.render.driver import Renderer
from versatiles_glyphs_tpu.writer import Writer


def test_fira_metadata(fira_entry):
    md = fira_entry.metadata
    assert md.family == "Fira Sans"
    assert md.generate_name() == "Fira Sans Regular"
    assert len(md.codepoints) == 1686
    assert fira_entry.units_per_em == 1000
    # The reference's glyph-count known answer (`file_entry.rs:69`).
    assert fira_entry.font["maxp"].numGlyphs == 2677


def test_noto_metadata(noto_entry):
    md = noto_entry.metadata
    assert md.family == "Noto Sans"
    assert md.generate_name() == "Noto Sans Regular"
    assert len(md.codepoints) == 3094


def test_fira_blocks(fira_entry):
    from versatiles_glyphs_tpu.font.wrapper import FontWrapper

    w = FontWrapper()
    w.add_file(fira_entry)
    blocks = w.get_blocks()
    assert len(blocks) == 20
    total = sum(len(b) for b in blocks)
    assert total == 1686
    b0 = next(b for b in blocks if b.start_index == 0)
    assert b0.filename() == "0-255.pbf"
    assert b0.range() == "0-255"


def test_same_name_fonts_merge():
    m = FontManager()
    m.add_paths([C.NOTO, C.NOTO_ARABIC, C.NOTO_TAMIL])
    assert list(m.fonts.keys()) == ["noto_sans_regular"]
    assert len(m.fonts["noto_sans_regular"].files) == 3


def test_first_file_claims_codepoint():
    m = FontManager()
    m.add_paths([C.NOTO, C.NOTO_ARABIC])
    wrapper = m.fonts["noto_sans_regular"]
    blocks = {b.start_index: b for b in wrapper.get_blocks()}
    # Latin block: all owned by the base Noto file.
    b0 = blocks[0]
    assert all(e is wrapper.files[0] for e in b0.glyphs.values())


# The reference's exact dummy-renderer manifest (manager.rs:175-237).
EXPECTED_MANIFEST = [
    "fira_sans_regular/",
    "fira_sans_regular/0-255.pbf (80022)",
    "fira_sans_regular/1024-1279.pbf (118037)",
    "fira_sans_regular/11264-11519.pbf (3579)",
    "fira_sans_regular/1280-1535.pbf (26296)",
    "fira_sans_regular/256-511.pbf (130750)",
    "fira_sans_regular/3584-3839.pbf (592)",
    "fira_sans_regular/42752-43007.pbf (5761)",
    "fira_sans_regular/43776-44031.pbf (487)",
    "fira_sans_regular/512-767.pbf (92634)",
    "fira_sans_regular/64256-64511.pbf (1032)",
    "fira_sans_regular/65024-65279.pbf (50)",
    "fira_sans_regular/7424-7679.pbf (7260)",
    "fira_sans_regular/768-1023.pbf (63760)",
    "fira_sans_regular/7680-7935.pbf (87078)",
    "fira_sans_regular/7936-8191.pbf (124520)",
    "fira_sans_regular/8192-8447.pbf (20301)",
    "fira_sans_regular/8448-8703.pbf (17395)",
    "fira_sans_regular/8704-8959.pbf (6511)",
    "fira_sans_regular/8960-9215.pbf (4375)",
    "fira_sans_regular/9472-9727.pbf (853)",
    "noto_sans_regular/",
    "noto_sans_regular/0-255.pbf (83519)",
    "noto_sans_regular/1024-1279.pbf (134641)",
    "noto_sans_regular/11264-11519.pbf (15645)",
    "noto_sans_regular/11520-11775.pbf (6086)",
    "noto_sans_regular/11776-12031.pbf (31703)",
    "noto_sans_regular/122624-122879.pbf (16432)",
    "noto_sans_regular/1280-1535.pbf (29170)",
    "noto_sans_regular/1536-1791.pbf (120630)",
    "noto_sans_regular/1792-2047.pbf (32515)",
    "noto_sans_regular/2048-2303.pbf (29582)",
    "noto_sans_regular/2304-2559.pbf (60280)",
    "noto_sans_regular/256-511.pbf (138365)",
    "noto_sans_regular/2816-3071.pbf (54964)",
    "noto_sans_regular/4096-4351.pbf (477)",
    "noto_sans_regular/42496-42751.pbf (50564)",
    "noto_sans_regular/42752-43007.pbf (107685)",
    "noto_sans_regular/43008-43263.pbf (636)",
    "noto_sans_regular/43264-43519.pbf (253)",
    "noto_sans_regular/43776-44031.pbf (27421)",
    "noto_sans_regular/512-767.pbf (103582)",
    "noto_sans_regular/64256-64511.pbf (89004)",
    "noto_sans_regular/64512-64767.pbf (215830)",
    "noto_sans_regular/64768-65023.pbf (245367)",
    "noto_sans_regular/65024-65279.pbf (73419)",
    "noto_sans_regular/65280-65535.pbf (1757)",
    "noto_sans_regular/6656-6911.pbf (5828)",
    "noto_sans_regular/67328-67583.pbf (16437)",
    "noto_sans_regular/70400-70655.pbf (822)",
    "noto_sans_regular/7168-7423.pbf (4501)",
    "noto_sans_regular/7424-7679.pbf (78289)",
    "noto_sans_regular/768-1023.pbf (77406)",
    "noto_sans_regular/7680-7935.pbf (146226)",
    "noto_sans_regular/7936-8191.pbf (136608)",
    "noto_sans_regular/8192-8447.pbf (58228)",
    "noto_sans_regular/8448-8703.pbf (55822)",
    "noto_sans_regular/8704-8959.pbf (168)",
    "noto_sans_regular/9472-9727.pbf (394)",
]


@pytest.fixture(scope="module")
def rendered_manifest():
    m = FontManager()
    m.add_paths([C.FIRA, C.NOTO, C.NOTO_ARABIC, C.NOTO_TAMIL])
    assert len(m.fonts) == 2
    w = Writer.new_dummy()
    m.render_glyphs(w, Renderer("zeros"))
    w.finish()
    return sorted(w.get_inner())


def test_full_pipeline_manifest_golden(rendered_manifest):
    assert rendered_manifest == EXPECTED_MANIFEST


# -- cmap-union lookup (reference: ttf-parser Face::glyph_index scans the
# -- same subtable union coverage is built from, metadata.rs:103-116) ----


def test_cmap_union_lookup_renders_non_best_subtable_codepoint():
    """A codepoint covered only by a non-"best" cmap subtable must still
    resolve and render (not be silently skipped)."""
    import io

    from fontTools.ttLib import TTFont

    from versatiles_glyphs_tpu.font.entry import FontFileEntry
    from versatiles_glyphs_tpu.utils.synth_font import build_ttf_split_cmap

    data, missing_cp = build_ttf_split_cmap()
    # Premise: fontTools' single "best" subtable misses the codepoint.
    best = TTFont(io.BytesIO(data)).getBestCmap()
    assert missing_cp not in best

    entry = FontFileEntry(data)
    assert missing_cp in entry.metadata.codepoints
    assert entry.glyph_name(missing_cp) is not None

    r = Renderer("exact")
    glyphs = r.render_block_glyphs([(missing_cp, entry)])
    assert len(glyphs) == 1
    g = glyphs[0]
    assert g.id == missing_cp
    assert g.bitmap is not None and len(g.bitmap) == (g.width + 6) * (g.height + 6)

    # And the union lookup agrees with the best-cmap everywhere else.
    for cp in entry.metadata.codepoints:
        if cp != missing_cp:
            assert entry.glyph_name(cp) == best[cp]
