"""Hole-bridging tessellation (C1's hole path, untested by the
reference goldens which are hole-free)."""

import numpy as np

from geo_sim_processing_a_spark.geom import primitives as P
from geo_sim_processing_a_spark.kernels.chordal_axis import chordal_axis_skeleton
from geo_sim_processing_a_spark.kernels.tessellate import tessellate


def test_square_with_hole_area_preserved():
    outer = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], float)
    hole = np.array([(4, 4), (4, 6), (6, 6), (6, 4), (4, 4)], float)
    tris = tessellate([outer, hole])
    assert len(tris) >= 8
    total = sum(P.ring_area(t) for t in tris)
    assert abs(total - (100.0 - 4.0)) < 1e-9
    # every triangle centroid is inside outer and outside the hole
    for t in tris:
        cx, cy = t[:, 0].mean(), t[:, 1].mean()
        assert P.point_in_ring(cx, cy, outer) >= 0
        assert P.point_in_ring(cx, cy, hole) <= 0


def test_skeleton_of_holed_polygon_runs():
    outer = np.array([(0, 0), (20, 0), (20, 10), (0, 10), (0, 0)], float)
    hole = np.array([(8, 4), (12, 4), (12, 6), (8, 6), (8, 4)], float)
    lines, stats = chordal_axis_skeleton([outer, hole], correction=True)
    assert stats["nbr_triangles"] >= 8
    assert len(lines) >= 1
    # skeleton stays inside the outer ring
    for l in lines:
        for x, y in l:
            assert P.point_in_ring(x, y, outer) >= 0


def test_hole_orientation_normalized():
    """A hole wound the SAME way as the outer ring must still be cut
    out (winding is normalized at entry — same-wound input previously
    triangulated the hole as filled area)."""
    import numpy as np
    from geo_sim_processing_a_spark.geom.primitives import ring_area
    from geo_sim_processing_a_spark.kernels.tessellate import tessellate
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole_ccw = np.array([[1, 5], [3, 5], [3, 7], [1, 7]], float)
    for hole in (hole_ccw, hole_ccw[::-1].copy()):
        tris = tessellate([outer, hole])
        area = sum(ring_area(t) for t in tris)
        assert abs(area - 96.0) < 1e-9
        # no triangle centroid inside the hole
        for t in tris:
            cx, cy = t.mean(axis=0)
            assert not (1 < cx < 3 and 5 < cy < 7)
