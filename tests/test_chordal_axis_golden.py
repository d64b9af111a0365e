"""Port of the reference golden suite chordal_axis_unittest.py:136-250.

Line coordinates are compared exactly; the LIST ordering and each
line's orientation are canonicalized (the reference asserts specific
indices of GEOS mergeLines output — an ordering artifact, see
FIXTURES.md §G2)."""

import numpy as np

from geo_sim_processing_a_spark.kernels.chordal_axis import chordal_axis_skeleton


def canon(lines):
    out = []
    for l in lines:
        l = np.asarray(l, dtype=np.float64)
        a, b = tuple(l[0]), tuple(l[-1])
        if b < a:
            l = l[::-1]
        out.append(tuple(map(tuple, l)))
    return sorted(out)


def run(outer, correction):
    lines, _ = chordal_axis_skeleton([np.array(outer, dtype=np.float64)], correction)
    return canon(lines)


def expect(*lines):
    return canon([np.array(l, dtype=np.float64) for l in lines])


def test_case01_triangle_no_skeleton():
    assert run([(0, 0), (10, 10), (20, 0), (0, 0)], False) == []


def test_case02_square_no_correction():
    got = run([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], False)
    assert got == expect([(0, 0), (5, 5), (10, 10)])


def test_case03_square_with_correction():
    got = run([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], True)
    assert got == expect([(0, 0), (5, 5), (10, 10)])


def test_case04_rectangle_no_correction():
    got = run([(0, 0), (0, 10), (10, 10), (20, 10), (20, 0), (10, 0), (0, 0)], False)
    assert got == expect([(0, 0), (5, 5), (10, 5), (15, 5), (20, 10)])


def test_case05_rectangle_with_correction():
    got = run([(0, 0), (0, 10), (10, 10), (20, 10), (20, 0), (10, 0), (0, 0)], True)
    assert got == expect([(0, 0), (5, 5), (10, 5), (15, 5), (20, 10)])


NOTCH = [(0, 0), (0, 10), (9, 10), (10, 11), (11, 10), (20, 10), (20, 0), (10, 0), (0, 0)]


def test_case06_junction_no_correction():
    got = run(NOTCH, False)
    assert got == expect(
        [(10, 6.66666666666666696), (9.5, 5), (4.5, 5), (0, 10)],
        [(10, 6.66666666666666696), (10, 10), (10, 11)],
        [(10, 6.66666666666666696), (10.5, 5), (15.5, 5), (20, 10)])


def test_case07_junction_with_correction():
    got = run(NOTCH, True)
    assert got == expect([(0, 10), (4.5, 5), (9.5, 5), (10.5, 5), (15.5, 5), (20, 10)])


T_SHAPE = [(0, 0), (0, 10), (25, 10), (50, 10), (50, 0), (30, 0), (30, -30),
           (20, -30), (20, 0), (0, 0)]


def test_case08_narrow_t_no_correction():
    got = run(T_SHAPE, False)
    assert got == expect(
        [(0, 0), (10, 5), (22.5, 5), (25, 3.33333333333333348)],
        [(20, -30), (25, -15), (25, 0), (25, 3.33333333333333348)],
        [(25, 3.33333333333333348), (27.5, 5), (40, 5), (50, 0)])


def test_case09_narrow_t_with_correction():
    got = run(T_SHAPE, True)
    assert got == expect(
        [(0, 0), (10, 5), (22.5, 5), (25, 5)],
        [(20, -30), (25, -15), (25, 0), (25, 5)],
        [(25, 5), (27.5, 5), (40, 5), (50, 0)])


X_SHAPE = [(0, 0), (0, 10), (20, 10), (20, 40), (30, 40), (30, 10), (50, 10),
           (50, 0), (30, 0), (30, -30), (20, -30), (20, 0), (0, 0)]


def test_case10_narrow_x_no_correction():
    got = run(X_SHAPE, False)
    assert got == expect(
        [(0, 0), (10, 5), (20, 5), (23.33333333333333215, 3.33333333333333348)],
        [(20, -30), (25, -15), (25, 0), (23.33333333333333215, 3.33333333333333348)],
        [(23.33333333333333215, 3.33333333333333348), (25, 5),
         (26.66666666666666785, 6.66666666666666696)],
        [(26.66666666666666785, 6.66666666666666696), (25, 10), (25, 25), (30, 40)],
        [(26.66666666666666785, 6.66666666666666696), (30, 5), (40, 5), (50, 10)])


def test_case11_narrow_x_with_correction():
    got = run(X_SHAPE, True)
    assert got == expect(
        [(0, 0), (10, 5), (20, 5), (25, 5)],
        [(20, -30), (25, -15), (25, 0), (25, 5)],
        [(25, 5), (30, 5), (40, 5), (50, 10)],
        [(25, 5), (25, 10), (25, 25), (30, 40)])
