"""Port of the reference golden suite reduce_bend_unittest.py:117-484.

Every case asserts EXACT output vertex sequences (QgsGeometry.equals is
a strict vertex-order comparison); case 26's rotated variants compare
after snap-to-grid 1e-10, mirroring reduce_bend_unittest.py:403-409.
Case 32 (QGIS layer normalization) is covered by the Spark explode test
in test_spark_pipeline.py instead.
"""

import math

import numpy as np
import pytest

from geo_sim_processing_a_spark.geom import primitives as P
from geo_sim_processing_a_spark.kernels.reduce_bend import (
    Feature, KIND_LINE, KIND_POINT, KIND_POLYGON, reduce_bends)


def line(coords):
    return Feature(KIND_LINE, [np.array(coords, dtype=np.float64)])


def point(coord):
    return Feature(KIND_POINT, [np.array([coord], dtype=np.float64)])


def _close(ring):
    ring = np.array(ring, dtype=np.float64)
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        ring = np.vstack([ring, ring[:1]])
    return ring


def polygon(outer, inners=()):
    return Feature(KIND_POLYGON, [_close(outer)] + [_close(r) for r in inners])


def run(feats, tol, del_pol=False, del_hole=False, smooth=False):
    res = reduce_bends(feats, tol, smooth_line=smooth,
                       flag_del_outer=del_pol, flag_del_inner=del_hole)
    return res.features


def assert_geom(feat, kind, rings):
    assert feat.kind == kind
    assert len(feat.rings) == len(rings)
    for got, exp in zip(feat.rings, rings):
        exp = np.array(exp, dtype=np.float64)
        assert got.shape == exp.shape, f"shape {got.shape} != {exp.shape}\n{got}\n{exp}"
        assert np.array_equal(got, exp), f"\ngot:\n{got}\nexpected:\n{exp}"


def test_case01_empty():
    assert run([], 5, del_pol=True, del_hole=True) == []


def test_case02_colinear_ring_start():
    f = run([polygon([(0, 10), (5, 10), (10, 10), (10, 0), (0, 0), (0, 10)])], 300)
    assert_geom(f[0], KIND_POLYGON, [[(0, 10), (10, 10), (10, 0), (0, 0), (0, 10)]])


def test_case03_pivot_on_bend():
    f = run([polygon([(5, 10), (5, 11), (6, 11), (6, 10), (10, 10), (10, 0), (0, 0), (0, 10), (5, 10)])], 3)
    assert_geom(f[0], KIND_POLYGON, [[(10, 0), (0, 0), (0, 10), (10, 10), (10, 0)]])


def test_case04_square_one_bend():
    f = run([polygon([(0, 10), (5, 9), (10, 10), (10, 0), (0, 0), (0, 10)])], 30)
    assert_geom(f[0], KIND_POLYGON, [[(10, 0), (0, 0), (0, 10), (10, 10), (10, 0)]])


def test_case05_triangle_one_bend():
    f = run([polygon([(0, 10), (5, 9), (10, 10), (5, 0), (0, 10)])], 3000)
    assert_geom(f[0], KIND_POLYGON, [[(10, 10), (5, 0), (0, 10), (10, 10)]])


def test_case06_no_bend():
    g0 = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    g1 = [(10, 0), (20, 0)]
    f = run([polygon(g0), line(g1)], 3)
    assert_geom(f[0], KIND_POLYGON, [g0])
    assert_geom(f[1], KIND_LINE, [g1])


def test_case07_no_bend_to_reduce():
    g0 = [(0, 0), (0, 5), (2.5, 4), (5, 5), (5, 0), (0, 0)]
    f = run([polygon(g0)], 3)
    assert_geom(f[0], KIND_POLYGON, [g0])


def test_case08_simple_line():
    f = run([line([(0, 0), (1, 1), (2, 0)])], 3)
    assert_geom(f[0], KIND_LINE, [[(0, 0), (2, 0)]])


def test_case09_point_and_lines():
    feats = [point((0, 0)), line([(0, 0), (100, 0)]), line([(0, 0), (0, 100)]),
             line([(0, 0), (100, 100)])]
    f = run(feats, 30)
    assert_geom(f[0], KIND_POINT, [[(0, 0)]])
    assert_geom(f[1], KIND_LINE, [[(0, 0), (100, 0)]])
    assert_geom(f[2], KIND_LINE, [[(0, 0), (0, 100)]])
    assert_geom(f[3], KIND_LINE, [[(0, 0), (100, 100)]])


def test_case10_mixed():
    g0 = [(0, 0), (30, 0)]
    g1 = [(10, 10), (15, 20), (20, 10), (10, 10)]
    f = run([line(g0), polygon(g1), point((0, 100))], 3)
    assert_geom(f[0], KIND_LINE, [g0])
    assert_geom(f[1], KIND_POLYGON, [g1])
    assert_geom(f[2], KIND_POINT, [[(0, 100)]])


def test_case11_zero_length_line():
    g0 = [(10, 10), (10, 10)]
    g1 = [(20, 20), (20, 20), (20, 20)]
    f = run([line(g0), line(g1)], 3)
    assert_geom(f[0], KIND_LINE, [g0])
    assert_geom(f[1], KIND_LINE, [g1])


def test_case12_degenerated_line():
    g0 = [(10, 10), (10, 20), (10, 10)]
    f = run([line(g0)], 3)
    assert_geom(f[0], KIND_LINE, [g0])


def test_case13_self_parallel():
    f = run([line([(0, 0), (30, 0), (20, 0)]),
             line([(0, 10), (-5, 10), (30, 10)]),
             line([(0, 20), (-5, 20), (30, 20), (20, 20)])], 3)
    assert_geom(f[0], KIND_LINE, [[(0, 0), (20, 0)]])
    assert_geom(f[1], KIND_LINE, [[(0, 10), (30, 10)]])
    assert_geom(f[2], KIND_LINE, [[(0, 20), (20, 20)]])


def test_case14_near_colinear():
    f = run([line([(0, 0), (20, 0), (25.000000000000001, 0.0000000000001), (30, 0)]),
             line([(0, 10), (30, 10), (35.000000000001, 10.00000000000001), (40, 10)]),
             point((0, 100))], 3)
    assert_geom(f[0], KIND_LINE, [[(0, 0), (30, 0)]])
    assert_geom(f[1], KIND_LINE, [[(0, 10), (40, 10)]])
    assert_geom(f[2], KIND_POINT, [[(0, 100)]])


def test_case15_small_bends():
    f = run([line([(0, 0), (30, 0)]),
             line([(0, 10), (30, 10), (30, 11), (31, 11), (31, 10), (40, 10),
                   (50, 10), (50, 11), (51, 10), (60, 10)]),
             point((0, 100))], 3)
    assert_geom(f[0], KIND_LINE, [[(0, 0), (30, 0)]])
    assert_geom(f[1], KIND_LINE, [[(0, 10), (60, 10)]])
    assert_geom(f[2], KIND_POINT, [[(0, 100)]])


def test_case16_polygon_with_bend_and_hole():
    outer = [(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)]
    inner = [(5, 5), (5, 6), (6, 6), (6, 5)]
    f = run([polygon(outer, [inner])], 300)
    assert_geom(f[0], KIND_POLYGON, [[(20, 20), (20, 0), (0, 0), (0, 20), (20, 20)],
                                     [(5, 5), (5, 6), (6, 6), (6, 5), (5, 5)]])


def test_case17_line_in_bend_blocks():
    coord = [(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)]
    f = run([polygon(coord), line([(10.1, 20.5), (10.2, 20.6), (10.3, 20.5)])], 3)
    assert_geom(f[0], KIND_POLYGON, [coord])
    assert_geom(f[1], KIND_LINE, [[(10.1, 20.5), (10.3, 20.5)]])


def test_case18_point_in_bend_blocks():
    coord = [(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0), (0, 0)]
    f = run([polygon(coord), point((10.1, 20.5))], 3)
    assert_geom(f[0], KIND_POLYGON, [coord])
    assert_geom(f[1], KIND_POINT, [[(10.1, 20.5)]])


def test_case19_self_intersection_rejected():
    coord = [(0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (30, 20), (30, 0),
             (10.5, 0), (10.5, 20.5)]
    f = run([line(coord)], 3)
    assert_geom(f[0], KIND_LINE, [coord])


def test_case20_hole_in_bend_deleted():
    coord0 = [(0, 0), (0, 20), (10, 20), (10, 21), (11, 21), (11, 20), (20, 20), (20, 0)]
    coord1 = [(10.1, 20.1), (10.1, 20.2), (10.2, 20.2), (10.2, 20.1), (10.1, 20.1)]
    f = run([polygon(coord0, [coord1])], 3, del_pol=True, del_hole=True)
    assert_geom(f[0], KIND_POLYGON, [[(20, 20), (20, 0), (0, 0), (0, 20), (20, 20)]])


def test_case21_hole_deleted():
    coord0 = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
    coord1 = [(0.1, 0.1), (0.1, 0.2), (0.2, 0.2), (0.2, 0.1), (0.1, 0.1)]
    f = run([polygon(coord0, [coord1])], 3, del_pol=False, del_hole=True)
    assert_geom(f[0], KIND_POLYGON, [coord0])


def test_case22_feature_deleted():
    coord0 = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
    coord1 = [(0.1, 0.1), (0.1, 0.2), (0.2, 0.2), (0.2, 0.1), (0.1, 0.1)]
    f = run([polygon(coord0, [coord1])], 3, del_pol=True, del_hole=False)
    assert len(f) == 0


def test_case23_feature_deleted_both_flags():
    coord0 = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
    coord1 = [(0.1, 0.1), (0.1, 0.2), (0.2, 0.2), (0.2, 0.1), (0.1, 0.1)]
    f = run([polygon(coord0, [coord1])], 3, del_pol=True, del_hole=True)
    assert len(f) == 0


def test_case24_zero_length_bend_base():
    f = run([line([(0, 0), (50, 0), (49, 1), (51, 1), (50, 0), (100, 0)])], 3,
            del_pol=True, del_hole=True)
    assert_geom(f[0], KIND_LINE, [[(0, 0), (100, 0)]])


def test_case25_wave_bend_alternates():
    f = run([line([(0, 0), (50, 0), (50, 2), (49, 2), (49, 1), (48, 1), (48, 3),
                   (51, 3), (51, 0), (100, 0)])], 10, del_pol=True, del_hole=True)
    assert_geom(f[0], KIND_LINE, [[(0, 0), (100, 0)]])


SMOOTH_IN = [(0, -25), (25, 0), (25, 1), (29, 1), (29, 0), (50, -25)]
SMOOTH_OUT = [(0, -25), (25, 0), (26.33333333333333215, 0.76980035891950094),
              (27.66666666666666785, 0.76980035891950094), (29, 0), (50, -25)]


def test_case26_smooth_golden():
    f = run([line(SMOOTH_IN)], 3.9, del_pol=True, del_hole=True, smooth=True)
    assert_geom(f[0], KIND_LINE, [SMOOTH_OUT])
    # reversed
    f = run([line(list(reversed(SMOOTH_IN)))], 3.9, del_pol=True, del_hole=True, smooth=True)
    assert_geom(f[0], KIND_LINE, [list(reversed(SMOOTH_OUT))])


@pytest.mark.parametrize("angle", [45., 90, 135, 180, 225, 270, 300])
def test_case26_smooth_rotations(angle):
    coords = np.array(SMOOTH_IN, dtype=np.float64)
    coords = P.rotate_cw(coords, angle) + np.array([25.0, 25.0])
    f = run([line(coords)], 3.9, del_pol=True, del_hole=True, smooth=True)
    got = f[0].rings[0] - np.array([25.0, 25.0])
    got = P.rotate_cw(got, -angle)
    grid = 1e-10
    got_g = np.round(got / grid) * grid
    exp_g = np.round(np.array(SMOOTH_OUT, dtype=np.float64) / grid) * grid
    assert got_g.shape == exp_g.shape
    assert np.array_equal(got_g, exp_g), f"\ngot:\n{got_g}\nexp:\n{exp_g}"


def test_case27_smooth_blocked_by_constraint():
    f = run([line([(-50, -25), (0, 0), (0, -1), (3, -1), (3, 0), (50, -25)]),
             line([(1.5, .1), (1.5, 3)])], 3, del_pol=True, del_hole=True, smooth=True)
    assert_geom(f[0], KIND_LINE, [[(-50, -25), (0, 0), (3, 0), (50, -25)]])


def test_case28_smooth_opposite_direction():
    f = run([line([(-50, -25), (0, 0), (0, -1), (3, -1), (3, 0), (50, 25)])], 3,
            del_pol=True, del_hole=True, smooth=True)
    assert_geom(f[0], KIND_LINE, [[(-50, -25), (0, 0), (1, 0.15579156685976017),
                                   (2, -0.15579156685976017), (3, 0), (50, 25)]])


def test_case29_smooth_self_intersection():
    f = run([line([(-50, -25), (0, 0), (0, -1), (3, -1), (3, 0), (50, 25),
                   (50, 0.05), (-50, 0.05)])], 3, del_pol=True, del_hole=True, smooth=True)
    assert_geom(f[0], KIND_LINE, [[(-50, -25), (0, 0), (3, 0), (50, 25),
                                   (50, 0.05), (-50, 0.05)]])


def test_case30_smooth_blocked_by_tiny_line():
    f = run([line([(-50, -25), (0, 0), (0, -1), (3, -1), (3, 0), (50, 25)]),
             line([(.9, .1), (1.1, .1)])], 3, del_pol=True, del_hole=True, smooth=True)
    assert_geom(f[0], KIND_LINE, [[(-50, -25), (0, 0), (3, 0), (50, 25)]])


def test_case31_colinear_first_last():
    f = run([line([(5, 0), (0, 0), (0, 10), (5, 10), (10, 10), (10, 0), (5, 0)])], 3,
            del_pol=True, del_hole=True, smooth=True)
    assert_geom(f[0], KIND_LINE, [[(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]])
