"""Geometry/flattening parity tests.

Golden values from the reference's inline tests
(`src/geometry/ring.rs`, `src/render/ring_builder.rs`).
"""

import numpy as np

from versatiles_glyphs_tpu.ops.flatten import (
    RingAccumulator,
    rings_bbox,
    rings_to_segments,
)


def test_quad_subdivision_count():
    # ring_builder.rs:206 — quad (0,0)-(10,10)-(20,0) at tol²=0.01
    # flattens to exactly 17 points.
    acc = RingAccumulator()
    acc.move_to(0.0, 0.0)
    acc.quad_to(10.0, 10.0, 20.0, 0.0)
    assert len(acc._current) == 17
    assert acc._current[-1] == (20.0, 0.0)


def test_cubic_subdivision_count():
    # ring_builder.rs:230 — cubic (0,0)-(10,10)-(20,10)-(30,0) → 17 points.
    acc = RingAccumulator()
    acc.move_to(0.0, 0.0)
    acc.cubic_to(10.0, 10.0, 20.0, 10.0, 30.0, 0.0)
    assert len(acc._current) == 17
    assert acc._current[-1] == (30.0, 0.0)


def test_curves_before_move_ignored():
    # ring_builder.rs:83-101
    acc = RingAccumulator()
    acc.quad_to(10.0, 10.0, 20.0, 20.0)
    acc.cubic_to(1, 2, 3, 4, 5, 6)
    assert acc._current == []
    assert acc.finish() == []


def test_ring_close_and_segments():
    acc = RingAccumulator()
    acc.move_to(0.0, 0.0)
    acc.line_to(1.0, 2.0)
    acc.line_to(-1.0, 3.0)
    rings = acc.finish()
    assert len(rings) == 1
    # Closed: first point appended.
    assert rings[0].shape == (4, 2)
    segs = rings_to_segments(rings)
    assert segs.shape == (3, 4)
    np.testing.assert_array_equal(segs[0], [0.0, 0.0, 1.0, 2.0])
    np.testing.assert_array_equal(segs[2], [-1.0, 3.0, 0.0, 0.0])


def test_already_closed_ring_not_reclosed():
    acc = RingAccumulator()
    acc.move_to(0.0, 0.0)
    acc.line_to(1.0, 0.0)
    acc.line_to(1.0, 1.0)
    acc.line_to(0.0, 0.0)
    rings = acc.finish()
    assert len(rings) == 1
    assert rings[0].shape == (4, 2)


def test_short_rings_dropped():
    # <3 points before close dropped; <4 after close dropped.
    acc = RingAccumulator()
    acc.move_to(0.0, 0.0)
    acc.line_to(1.0, 0.0)
    acc.move_to(5.0, 5.0)  # drops the 2-point ring
    assert acc.finish() == []


def test_move_to_saves_previous_ring():
    acc = RingAccumulator()
    acc.move_to(0.0, 0.0)
    acc.line_to(1.0, 0.0)
    acc.line_to(1.0, 1.0)
    acc.move_to(9.0, 9.0)
    rings = acc.rings
    assert len(rings) == 1


def test_bbox():
    acc = RingAccumulator()
    acc.move_to(0.0, 0.0)
    acc.line_to(2.0, 2.0)
    acc.line_to(1.0, 3.0)
    acc2_rings = acc.finish()
    bb = rings_bbox(acc2_rings)
    assert bb == (0.0, 0.0, 2.0, 3.0)
    assert rings_bbox([]) is None
