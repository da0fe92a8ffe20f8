"""Vectorized font-level prep (`render.metrics.build_cores`) must be
bit-identical to the per-glyph path (`render.metrics.prepare_glyph`)
that replicates `/root/reference/src/render/renderer.rs:64-149`."""

import numpy as np

from versatiles_glyphs_tpu.render.metrics import prepare_glyph


def _per_glyph_prep(entry, cp):
    name = entry.glyph_name(cp)
    rings = entry.outline_rings(name)
    return prepare_glyph(cp, rings, entry.units_per_em, entry.hor_advance(name))


def test_cores_available(fira_entry):
    cores = fira_entry.prep_cores
    assert cores is not None, "native flattener should be available in CI"
    # Every cmap-mapped glyph gets an entry (glyf fonts: all
    # supported). On the all-native path the table is keyed by glyph
    # id; keys must cover exactly the glyph_key of every mapped cp.
    keys = {fira_entry.glyph_key(cp) for cp in fira_entry.metadata.codepoints}
    assert set(cores.keys()) == keys
    assert all(c is not None for c in cores.values())


def test_core_metrics_bit_identical(fira_entry):
    cores = fira_entry.prep_cores
    for cp in fira_entry.metadata.codepoints:
        core = cores[fira_entry.glyph_key(cp)]
        ref = _per_glyph_prep(fira_entry, cp)
        got = core.make_prep(cp)
        assert got.codepoint == cp
        assert got.advance == ref.advance
        assert got.dx == ref.dx
        assert got.empty == ref.empty
        if ref.empty:
            continue
        assert (got.x0, got.y0, got.x1, got.y1) == (ref.x0, ref.y0, ref.x1, ref.y1)
        assert (got.width, got.height) == (ref.width, ref.height)


def test_core_chains_bit_identical(fira_entry):
    cores = fira_entry.prep_cores
    # Spot-check the heavy per-point arrays on a spread of codepoints
    # (every 13th) — full-font f64 equality of transformed points.
    cps = fira_entry.metadata.codepoints[::13]
    for cp in cps:
        ref = _per_glyph_prep(fira_entry, cp)
        got = cores[fira_entry.glyph_key(cp)].make_prep(cp)
        if ref.empty:
            continue
        assert got.npts == ref.npts
        np.testing.assert_array_equal(got.chain32, ref.chain32)
        np.testing.assert_array_equal(got.chain16, ref.chain16)
        np.testing.assert_array_equal(got.valid8, ref.valid8)
        np.testing.assert_array_equal(got.segments, ref.segments)
        assert len(got.rings_px) == len(ref.rings_px)
        for a, b in zip(got.rings_px, ref.rings_px):
            np.testing.assert_array_equal(a, b)


def test_shared_core_across_codepoints(fira_entry):
    # Several codepoints mapping to one glyph name share the core's
    # arrays (Fira's best cmap happens to be injective, so exercise the
    # mechanism directly: two preps from one core).
    core = fira_entry.prep_cores[fira_entry.glyph_key(ord("A"))]
    a = core.make_prep(65)
    b = core.make_prep(0x10041)
    assert (a.codepoint, b.codepoint) == (65, 0x10041)
    assert a.advance == b.advance == 13
    assert a.chain32 is b.chain32
    assert a.valid8 is b.valid8
    np.testing.assert_array_equal(a.segments, b.segments)


def test_driver_uses_cores(fira_entry):
    from versatiles_glyphs_tpu.render.driver import Renderer

    r = Renderer("zeros")
    p = r.prep_glyph(fira_entry, ord("A"))
    # The fast path shares the core's cached chain arrays (chain16 is
    # eager; chain32 fills lazily on the core, still shared).
    core = fira_entry.prep_cores[fira_entry.glyph_key(ord("A"))]
    assert p._chain16 is core.chain16
    assert p.chain32 is core.chain32
    assert (p.pbf_width, p.pbf_height, p.pbf_left, p.pbf_top, p.advance) == (
        14, 17, 0, -7, 13,
    )


def test_prep_block_equivalent_to_prep_glyph(fira_entry):
    """The hoisted block loop must stay behaviorally identical to the
    per-codepoint path (same preps, same order, same filter) — the
    divergence lock for the two dispatch implementations."""
    from versatiles_glyphs_tpu.render.driver import Renderer

    r = Renderer("zeros")
    cps = list(fira_entry.metadata.codepoints) + [0xD800, 0x110000, 0x10FFFF]
    want = []
    for cp in cps:
        p = r.prep_glyph(fira_entry, cp)
        if p is not None:
            want.append(p)
    got = r.prep_block((cp, fira_entry) for cp in cps)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.codepoint == b.codepoint
        assert (a.empty, a.advance, a.width, a.height, a.x0, a.y0) == (
            b.empty, b.advance, b.width, b.height, b.x0, b.y0
        )
