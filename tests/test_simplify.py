"""G3 — simplifier pinned behaviors (FIXTURES.md §G3; the reference has
no unit tests for simplify_algorithm.py and its repair branch raises
TypeError as written — we pin the documented intent)."""

import numpy as np

from geo_sim_processing_a_spark.kernels.simplify import (
    douglas_peucker_line, douglas_peucker_ring, repair_polygon,
    simplify_feature, visvalingam_whyatt_line, visvalingam_whyatt_ring)


def arr(c):
    return np.array(c, dtype=np.float64)


def test_dp_line_basic():
    got = douglas_peucker_line(arr([(0, 0), (1, 0.1), (2, -0.1), (3, 5), (4, 6), (5, 7), (6, 8.1), (7, 9), (8, 9), (9, 9)]), 1.0)
    assert np.array_equal(got, arr([(0, 0), (2, -0.1), (3, 5), (7, 9), (9, 9)]))


def test_dp_line_keeps_endpoints():
    got = douglas_peucker_line(arr([(0, 0), (5, 0.5), (10, 0)]), 2.0)
    assert np.array_equal(got, arr([(0, 0), (10, 0)]))


def test_dp_ring_square_with_noise():
    ring = arr([(0, 0), (5, 0.2), (10, 0), (10, 10), (5, 10.2), (0, 10), (0, 0)])
    got = douglas_peucker_ring(ring, 1.0)
    assert np.array_equal(got, arr([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]))


def test_dp_ring_degenerate_falls_back():
    ring = arr([(0, 0), (10, 0), (10, 1), (0, 1), (0, 0)])
    got = douglas_peucker_ring(ring, 50.0)
    # collapsing below 4 points => unchanged
    assert np.array_equal(got, ring)


def test_vw_line():
    got = visvalingam_whyatt_line(arr([(0, 0), (1, 0.1), (2, 0), (10, 0)]), 1.0)
    assert np.array_equal(got, arr([(0, 0), (10, 0)]))


def test_vw_ring_preserved():
    ring = arr([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    got = visvalingam_whyatt_ring(ring, 1.0)
    assert np.array_equal(got, ring)


def test_repair_deletes_escaped_hole():
    # FIXTURES.md G3.3: hole near an edge; after simplification moves
    # the edge past the hole, the hole must be deleted.
    outer = arr([(0, 0), (0, 10), (4, 5), (10, 10), (10, 0), (0, 0)])
    hole = arr([(1, 4.9), (1, 5.1), (2, 5.1), (2, 4.9), (1, 4.9)])
    simplified_outer = douglas_peucker_ring(outer, 6.0)
    rings, deleted = repair_polygon([simplified_outer, hole])
    assert deleted in (0, 1)
    # direct check: hole fully outside a shrunken outer is deleted
    shrunk = arr([(3, 0), (3, 10), (10, 10), (10, 0), (3, 0)])
    rings, deleted = repair_polygon([shrunk, hole])
    assert deleted == 1
    assert len(rings) == 1


def test_repair_keeps_inner_hole():
    outer = arr([(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)])
    hole = arr([(4, 4), (4, 6), (6, 6), (6, 4), (4, 4)])
    rings, deleted = repair_polygon([outer, hole])
    assert deleted == 0
    assert len(rings) == 2
    assert np.array_equal(rings[0], outer)


def test_repair_picks_largest_as_outer():
    small = arr([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
    big = arr([(-5, -5), (15, -5), (15, 15), (-5, 15), (-5, -5)])
    rings, deleted = repair_polygon([small, big])
    assert np.array_equal(rings[0], big)
    assert deleted == 0


def test_simplify_feature_polygon():
    outer = arr([(0, 0), (5, 0.2), (10, 0), (10, 10), (0, 10), (0, 0)])
    rings, deleted = simplify_feature([outer], kind=2, tolerance=1.0)
    assert np.array_equal(rings[0], arr([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]))
    assert deleted == 0


def test_pinched_ring_detected():
    """Vertex-on-edge self-touch (pinched ring) counts as
    self-intersecting: simplification must fall back to the input."""
    import numpy as np
    from geo_sim_processing_a_spark.kernels.simplify import (
        _ring_self_intersects)
    pinched = np.array([[0, 0], [2, 2], [4, 0], [4, 2], [0, 2]], float)
    assert _ring_self_intersects(pinched)


def test_repair_keeps_touching_hole_drops_crossing():
    """within-semantics: a hole touching the exterior boundary at a
    vertex is VALID and kept; a hole whose edge crosses the exterior is
    deleted — including the concave case where every hole vertex is
    inside but an edge pokes outside."""
    import numpy as np
    from geo_sim_processing_a_spark.kernels.simplify import repair_polygon

    def ring(pts):
        return np.array(pts + [pts[0]], float)

    outer = ring([[0, 0], [10, 0], [10, 10], [0, 10]])
    touch = ring([[0, 0], [2, 0.5], [1, 2]])
    kept, ndel = repair_polygon([outer, touch])
    assert ndel == 0 and len(kept) == 2
    cross = ring([[8, 8], [12, 8], [12, 9], [8, 9]])
    kept, ndel = repair_polygon([outer, cross])
    assert ndel == 1 and len(kept) == 1
    concave = ring([[0, 0], [10, 0], [10, 10], [5, 2], [0, 10]])
    poke = ring([[2, 3], [8, 3], [8, 4], [2, 4]])
    kept, ndel = repair_polygon([concave, poke])
    assert ndel == 1
