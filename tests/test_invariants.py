"""Topology invariants on seeded pseudo-random inputs (FIXTURES.md
§5.2.2) plus run-statistics parity (RbResults counters) and the
multi-part explode normalization (P1, the portable part of reference
test_case32)."""

import numpy as np
import pytest

from geo_sim_processing_a_spark.geom import primitives as P
from geo_sim_processing_a_spark.kernels.reduce_bend import (
    Feature, KIND_LINE, KIND_POINT, KIND_POLYGON, reduce_bends)
from geo_sim_processing_a_spark.sources.pages import trace_polyline


def line_is_simple(coords: np.ndarray) -> bool:
    n = len(coords) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if coords[0, 0] == coords[-1, 0] and coords[0, 1] == coords[-1, 1] \
                    and i == 0 and j == n - 1:
                continue
            p = P.segment_intersection_point(coords[i], coords[i + 1],
                                             coords[j], coords[j + 1])
            if p is not None:
                if (p[0] == coords[i, 0] and p[1] == coords[i, 1]) or \
                        (p[0] == coords[i + 1, 0] and p[1] == coords[i + 1, 1]):
                    continue
                return False
            if P.collinear_overlap(coords[i], coords[i + 1], coords[j], coords[j + 1]):
                return False
    return True


@pytest.mark.parametrize("seed", [1, 7, 42, 1337, 99991])
def test_reduction_preserves_simplicity(seed):
    coords = trace_polyline(seed * 0x9E3779B97F4A7C15 % 2**63, 0.0, 0.0)
    assert line_is_simple(coords) or True  # input may self-intersect
    res = reduce_bends([Feature(KIND_LINE, [coords])], 0.004)
    out = res.features[0].rings[0]
    if line_is_simple(coords):
        assert line_is_simple(out), f"seed {seed} output self-intersects"
    assert len(out) <= len(coords)


@pytest.mark.parametrize("seed", [3, 11, 2024])
def test_reduction_never_swallows_neighbors(seed):
    """Points inside any bend must block that bend's reduction: after
    reduction the point must not change sides (here: a point placed
    inside a known bend keeps the polygon unchanged around it)."""
    rng = np.random.RandomState(seed)
    # square with a rectangular bump; point inside the bump
    x0 = float(rng.uniform(-5, 5))
    poly = np.array([(x0, 0), (x0, 10), (x0 + 4, 10), (x0 + 4, 10.8), (x0 + 4.8, 10.8),
                     (x0 + 4.8, 10), (x0 + 9, 10), (x0 + 9, 0), (x0, 0)])
    pt = np.array([[x0 + 4.4, 10.4]])
    res = reduce_bends([Feature(KIND_POLYGON, [poly]), Feature(KIND_POINT, [pt])], 2.0)
    out = res.features[0].rings[0]
    # the bump must survive (sidedness constraint)
    assert any(np.isclose(v[1], 10.8) for v in out), out


def test_counters_match_reference_semantics():
    """RbResults parity on golden case 15 shapes: counters exist per
    pass, pass count >= 3 (min 2 passes then the empty confirming
    pass), detected >= reduced, and hole/polygon deletion counters."""
    line = np.array([(0, 10), (30, 10), (30, 11), (31, 11), (31, 10), (40, 10),
                     (50, 10), (50, 11), (51, 10), (60, 10)], dtype=float)
    res = reduce_bends([Feature(KIND_LINE, [line])], 3)
    assert res.nbr_pass >= 3
    assert len(res.nbr_bend_reduced) == res.nbr_pass + 1
    assert sum(res.nbr_bend_reduced) >= 2
    assert res.in_nbr_features == 1 and res.out_nbr_features == 1

    outer = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
    inner = [(0.1, 0.1), (0.1, 0.2), (0.2, 0.2), (0.2, 0.1), (0.1, 0.1)]
    res2 = reduce_bends([Feature(KIND_POLYGON, [np.array(outer, float), np.array(inner, float)])],
                        3, flag_del_outer=False, flag_del_inner=True)
    assert res2.nbr_hole_del == 1
    res3 = reduce_bends([Feature(KIND_POLYGON, [np.array(outer, float), np.array(inner, float)])],
                        3, flag_del_outer=True, flag_del_inner=False)
    assert res3.nbr_pol_del == 1


def test_multipart_explode_normalization(spark):
    """P1 — native:multiparttosingleparts equivalent: posexplode of
    multi-part geometry arrays, parent id kept (reference
    reduce_bend_algorithm.py:1109-1122)."""
    from pyspark.sql import functions as F
    rows = [(1, [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]),
            (2, [[[5.0, 5.0], [6.0, 6.0]]])]
    df = spark.createDataFrame(rows, "fid int, parts array<array<array<double>>>")
    single = (df.select("fid", F.posexplode("parts").alias("part_idx", "coords")))
    got = sorted((r["fid"], r["part_idx"]) for r in single.collect())
    assert got == [(1, 0), (1, 1), (2, 0)]


def test_collinear_overlap_interior_touch_violates():
    """Reference pattern[1]=='0' inside a collinear overlap: an
    endpoint of the other segment lying in the chord's INTERIOR is a
    simplicity violation even though the interiors overlap in dim 1."""
    import numpy as np
    from geo_sim_processing_a_spark.geom.relate import (
        chord_violated_f, simplicity_violated)
    assert chord_violated_f(0, 0, 10, 0, 5, 0, 15, 0)
    assert not chord_violated_f(0, 0, 10, 0, 10, 0, 15, 0)
    assert not chord_violated_f(0, 0, 10, 0, -5, 0, 15, 0)
    assert chord_violated_f(0, 0, 10, 0, 2, 0, 8, 0)
    assert not chord_violated_f(0, 0, 10, 0, 0, 0, 10, 0)
    a = np.array([[0.0, 0.0], [10.0, 0.0]])
    assert simplicity_violated(a, np.array([[5.0, 0.0], [15.0, 0.0]]))
    assert not simplicity_violated(a, np.array([[-5.0, 0.0], [15.0, 0.0]]))
