"""Vectorized geometry toolbox vs the reference's geometry unit tests
(`src/geometry/{point,segment,ring,rings,bbox}.rs` inline tests)."""

import numpy as np

from versatiles_glyphs_tpu.ops.geometry import (
    EMPTY_BBOX,
    bbox_include,
    bbox_is_empty,
    bbox_of,
    bbox_round,
    cross_product,
    midpoint,
    project_point_on_segment,
    ring_winding_number,
    rings_contain_point,
    segment_squared_distance_to_point,
    squared_distance,
)


def test_midpoint_and_squared_distance():
    # point.rs: midpoint / squared_distance_to
    assert tuple(midpoint([0.0, 0.0], [4.0, 6.0])) == (2.0, 3.0)
    assert squared_distance([0.0, 0.0], [3.0, 4.0]) == 25.0
    # batched
    p = np.array([[0.0, 0.0], [1.0, 1.0]])
    q = np.array([[3.0, 4.0], [1.0, 1.0]])
    np.testing.assert_array_equal(squared_distance(p, q), [25.0, 0.0])


def test_project_point_on_segment_cases():
    # segment.rs:117-163: degenerate → start; clamped before/after;
    # interior projection.
    np.testing.assert_array_equal(
        project_point_on_segment([2.0, 3.0], [2.0, 3.0], [10.0, 10.0]),
        [2.0, 3.0],
    )
    np.testing.assert_array_equal(
        project_point_on_segment([1.0, 1.0], [5.0, 1.0], [-2.0, 1.0]),
        [1.0, 1.0],
    )
    np.testing.assert_array_equal(
        project_point_on_segment([1.0, 1.0], [5.0, 1.0], [10.0, 1.0]),
        [5.0, 1.0],
    )
    # segment.rs doctest: (5,5) onto (0,0)-(10,0) → (5,0)
    np.testing.assert_array_equal(
        project_point_on_segment([0.0, 0.0], [10.0, 0.0], [5.0, 5.0]),
        [5.0, 0.0],
    )


def test_segment_squared_distance_to_point():
    # segment.rs:96 doctest: (0,3) to segment (0,0)-(5,0) → 9
    assert segment_squared_distance_to_point(
        [0.0, 0.0], [5.0, 0.0], [0.0, 3.0]
    ) == 9.0
    # batched over segments (the kernel's inner function shape)
    v = np.array([[0.0, 0.0], [10.0, 0.0]])
    w = np.array([[5.0, 0.0], [10.0, 5.0]])
    d2 = segment_squared_distance_to_point(v, w, np.array([0.0, 3.0]))
    np.testing.assert_allclose(d2, [9.0, 100.0])


def test_winding_number_degenerate():
    # ring.rs:439-451: empty / single-point / open 2-point ring → 0
    assert ring_winding_number(np.zeros((0, 2)), [1.0, 1.0]) == 0
    assert ring_winding_number(np.array([[0.0, 0.0]]), [1.0, 1.0]) == 0
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    assert ring_winding_number(line, [1.0, 1.0]) == 0


def test_winding_number_square():
    # ring.rs:453-474: CCW square → +1 inside, 0 outside
    sq = np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]
    )
    assert ring_winding_number(sq, [5.0, 5.0]) == 1
    assert ring_winding_number(sq, [11.0, 5.0]) == 0
    # CW orientation winds −1
    assert ring_winding_number(sq[::-1], [5.0, 5.0]) == -1


def test_rings_contain_point_with_hole():
    # rings.rs:93-99 semantics: outer CCW ring + CW hole → points in
    # the hole have zero total winding.
    outer = np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]
    )
    hole = np.array(
        [[3.0, 3.0], [3.0, 7.0], [7.0, 7.0], [7.0, 3.0], [3.0, 3.0]]
    )
    rings = [outer, hole]
    assert rings_contain_point(rings, [1.0, 1.0])
    assert not rings_contain_point(rings, [5.0, 5.0])
    assert not rings_contain_point(rings, [11.0, 5.0])


def test_cross_product_orientation():
    # ring.rs:230: left turn positive, right turn negative, collinear 0
    assert cross_product([0.0, 0.0], [1.0, 0.0], [1.0, 1.0]) > 0
    assert cross_product([0.0, 0.0], [1.0, 0.0], [1.0, -1.0]) < 0
    assert cross_product([0.0, 0.0], [1.0, 0.0], [2.0, 0.0]) == 0


def test_bbox_semantics():
    # bbox.rs:26-81: fresh box is empty; a single point stays "empty";
    # a 1-axis-degenerate box is NOT empty.
    assert bbox_is_empty(EMPTY_BBOX)
    one = bbox_of(np.array([[2.0, 3.0]]))
    assert bbox_is_empty(one)
    flat = bbox_of(np.array([[0.0, 1.0], [5.0, 1.0]]))
    assert not bbox_is_empty(flat)

    b = bbox_include(bbox_of(np.array([[0.0, 0.0]])), bbox_of(np.array([[2.0, -1.0]])))
    np.testing.assert_array_equal(b, [[0.0, -1.0], [2.0, 0.0]])


def test_bbox_round_half_away():
    # bbox.rs:87-92 rounds with Rust f64::round (half away from zero).
    b = np.array([[-1.5, 0.5], [2.5, -0.5]])
    np.testing.assert_array_equal(bbox_round(b), [[-2.0, 1.0], [3.0, -1.0]])
