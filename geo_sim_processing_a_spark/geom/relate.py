"""Topological predicates needed by the Sherbend constraint checks.

The reference delegates these to GEOS via QGIS:
 - ``relate`` DE-9IM pattern positions [0] (Interior/Interior) and [1]
   (Interior/Boundary) for the simplicity constraint
   (reduce_bend_algorithm.py:1399-1422),
 - ``disjoint`` for the intersection constraint (:1424-1443),
 - ``contains`` for the sidedness constraint (:1445-1465).

We only need those boolean outcomes for (polyline, segment-or-point)
and (ring-polygon, segment-or-point) pairs, so the full DE-9IM machine
is not required (SURVEY.md §2.7 R4-R6).
"""

from __future__ import annotations

import numpy as np

from . import primitives as P
from .primitives import (
    collinear_overlap,
    on_segment,
    point_in_ring,
    point_on_polyline,
    segment_intersection_point,
    segments_intersect,
)


def _pt_eq(a, b) -> bool:
    return a[0] == b[0] and a[1] == b[1]


def simplicity_violated_chord(ax0, ay0, ax1, ay1, seg_b: np.ndarray) -> bool:
    """Fast path of simplicity_violated for a 2-point replacement line
    (the chord case — every non-smooth constraint check).  Identical
    arithmetic and decisions to the generic path below, with the
    single-segment structure inlined."""
    b0x, b0y = seg_b[0, 0], seg_b[0, 1]
    b1x, b1y = seg_b[1, 0], seg_b[1, 1]
    # collinear overlap?
    d3 = (ax1 - ax0) * (b0y - ay0) - (ay1 - ay0) * (b0x - ax0)
    d4 = (ax1 - ax0) * (b1y - ay0) - (ay1 - ay0) * (b1x - ax0)
    if d3 == 0.0 and d4 == 0.0:
        # both B endpoints on line A: overlap iff 1-D projections meet
        if abs(ax1 - ax0) >= abs(ay1 - ay0):
            a_lo, a_hi = (ax0, ax1) if ax0 <= ax1 else (ax1, ax0)
            b_lo, b_hi = (b0x, b1x) if b0x <= b1x else (b1x, b0x)
        else:
            a_lo, a_hi = (ay0, ay1) if ay0 <= ay1 else (ay1, ay0)
            b_lo, b_hi = (b0y, b1y) if b0y <= b1y else (b1y, b0y)
        if min(a_hi, b_hi) > max(a_lo, b_lo):
            # dim-1 overlap: pattern[0]=='1' (allowed) — but a B
            # endpoint STRICTLY inside A's interval is pattern[1]=='0'
            # ("extremity touching the interior"): violation
            return (a_lo < b_lo < a_hi) or (a_lo < b_hi < a_hi)
        # degenerate collinear touching handled by the generic machinery
        return simplicity_violated(np.array([[ax0, ay0], [ax1, ay1]]), seg_b)
    p = P.segment_intersection_point((ax0, ay0), (ax1, ay1), (b0x, b0y), (b1x, b1y))
    if p is None:
        return False
    # both generic outcomes (pattern[0] point-II and pattern[1]) collapse
    # to "intersection point interior to A" when A is one segment
    return not ((p[0] == ax0 and p[1] == ay0) or (p[0] == ax1 and p[1] == ay1))


def simplicity_violated(line_a: np.ndarray, seg_b: np.ndarray) -> bool:
    """Replicates the accept/reject decision of
    ReduceBend.validate_simplicity for one candidate segment:
    DE-9IM pattern[0]=='0' (interiors meet in a point) or
    pattern[1]=='0' (interior of A meets a boundary point of B).

    ``line_a``: (m,2) replacement sub line (2 pts for a chord, 4 pts for
    a smooth line).  ``seg_b``: (2,2) segment of the same source line.
    A collinear 1-D overlap gives pattern[0]=='1' (allowed) — but still
    violates via pattern[1]=='0' when a B endpoint lies in A's interior
    (GEOS records the 0-dim boundary touch separately from the 1-dim
    interior overlap).
    """
    a_start = line_a[0]
    a_end = line_a[-1]
    b0, b1 = seg_b[0], seg_b[1]

    has_overlap = False
    point_ii = False

    for k in range(len(line_a) - 1):
        s0, s1 = line_a[k], line_a[k + 1]
        if collinear_overlap(s0, s1, b0, b1):
            has_overlap = True
            # pattern[1]=='0' applies INSIDE an overlap too: a B
            # endpoint lying in A's interior (GEOS: II dim 1 with a
            # 0-dim I(A)-boundary(B) entry — "extremity touching the
            # interior").  B's endpoints are on the carrier line here;
            # in-interval and not a global A endpoint => in interior(A).
            for b in (b0, b1):
                if (min(s0[0], s1[0]) <= b[0] <= max(s0[0], s1[0])
                        and min(s0[1], s1[1]) <= b[1] <= max(s0[1], s1[1])
                        and not (_pt_eq(b, a_start) or _pt_eq(b, a_end))):
                    return True
            continue
        p = segment_intersection_point(s0, s1, b0, b1)
        if p is None:
            continue
        # p in interior(A)? interior excludes only the global endpoints
        in_int_a = not (_pt_eq(p, a_start) or _pt_eq(p, a_end))
        # p in interior(B)?
        in_int_b = not (_pt_eq(p, b0) or _pt_eq(p, b1))
        if in_int_a and in_int_b:
            point_ii = True
        # pattern[1]: interior(A) ∩ boundary(B) is a point
        if in_int_a and not in_int_b:
            return True

    if point_ii and not has_overlap:
        return True
    # A collinear overlap makes dim(II)==1, so a point-II elsewhere no
    # longer yields pattern[0]=='0'; the interior-touch case inside the
    # overlap was already handled above.
    return False


def chord_violated_f(ax0: float, ay0: float, ax1: float, ay1: float,
                     bx0: float, by0: float, bx1: float, by1: float) -> bool:
    """simplicity_violated_chord on plain Python floats — the same
    IEEE-double arithmetic without any array machinery.  Candidate sets
    in the Sherbend constraint checks are tiny (usually < 20 segments);
    interpreter-level float ops beat numpy dispatch by ~10x there
    (measured: vectorizing these predicates REGRESSED the kernel 15%)."""
    adx, ady = ax1 - ax0, ay1 - ay0
    d3 = adx * (by0 - ay0) - ady * (bx0 - ax0)
    d4 = adx * (by1 - ay0) - ady * (bx1 - ax0)
    if d3 == 0.0 and d4 == 0.0:
        if abs(adx) >= abs(ady):
            a_lo, a_hi = (ax0, ax1) if ax0 <= ax1 else (ax1, ax0)
            b_lo, b_hi = (bx0, bx1) if bx0 <= bx1 else (bx1, bx0)
        else:
            a_lo, a_hi = (ay0, ay1) if ay0 <= ay1 else (ay1, ay0)
            b_lo, b_hi = (by0, by1) if by0 <= by1 else (by1, by0)
        if min(a_hi, b_hi) > max(a_lo, b_lo):
            # dim-1 overlap: pattern[0]=='1' (allowed) — but a B
            # endpoint STRICTLY inside A's interval is pattern[1]=='0'
            # ("extremity touching the interior"): violation
            return (a_lo < b_lo < a_hi) or (a_lo < b_hi < a_hi)
        return simplicity_violated(np.array([[ax0, ay0], [ax1, ay1]]),
                                   np.array([[bx0, by0], [bx1, by1]]))
    d1 = (bx1 - bx0) * (ay0 - by0) - (by1 - by0) * (ax0 - bx0)
    d2 = (bx1 - bx0) * (ay1 - by0) - (by1 - by0) * (ax1 - bx0)
    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and \
            ((d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0):
        denom = d1 - d2
        if denom == 0.0:
            return False  # crossing point IS an A endpoint
        t = d1 / denom
        if not (0.0 <= t <= 1.0):
            return False
        px = ax0 + t * (ax1 - ax0)
        py = ay0 + t * (ay1 - ay0)
        return not ((px == ax0 and py == ay0) or (px == ax1 and py == ay1))
    return False


def chord_intersects_f(ax0: float, ay0: float, ax1: float, ay1: float,
                       bx0: float, by0: float, bx1: float, by1: float) -> bool:
    """segments_intersect on plain Python floats (same decisions)."""
    d1 = (bx1 - bx0) * (ay0 - by0) - (by1 - by0) * (ax0 - bx0)
    d2 = (bx1 - bx0) * (ay1 - by0) - (by1 - by0) * (ax1 - bx0)
    d3 = (ax1 - ax0) * (by0 - ay0) - (ay1 - ay0) * (bx0 - ax0)
    d4 = (ax1 - ax0) * (by1 - ay0) - (ay1 - ay0) * (bx1 - ax0)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) \
            and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
        return True
    if d1 == 0 and min(bx0, bx1) <= ax0 <= max(bx0, bx1) \
            and min(by0, by1) <= ay0 <= max(by0, by1):
        return True
    if d2 == 0 and min(bx0, bx1) <= ax1 <= max(bx0, bx1) \
            and min(by0, by1) <= ay1 <= max(by0, by1):
        return True
    if d3 == 0 and min(ax0, ax1) <= bx0 <= max(ax0, ax1) \
            and min(ay0, ay1) <= by0 <= max(ay0, ay1):
        return True
    if d4 == 0 and min(ax0, ax1) <= bx1 <= max(ax0, ax1) \
            and min(ay0, ay1) <= by1 <= max(ay0, ay1):
        return True
    return False


def chord_touches_point_f(ax0: float, ay0: float, ax1: float, ay1: float,
                          px: float, py: float) -> bool:
    """on_segment(A, p) on plain Python floats."""
    if (ax1 - ax0) * (py - ay0) - (ay1 - ay0) * (px - ax0) != 0.0:
        return False
    return min(ax0, ax1) <= px <= max(ax0, ax1) \
        and min(ay0, ay1) <= py <= max(ay0, ay1)


def disjoint_line_segment(line: np.ndarray, seg: np.ndarray) -> bool:
    """GEOS disjoint(line, segment): no shared point at all."""
    for k in range(len(line) - 1):
        if segments_intersect(line[k], line[k + 1], seg[0], seg[1]):
            return False
    return True


def disjoint_line_point(line: np.ndarray, pt) -> bool:
    return not point_on_polyline(pt[0], pt[1], line)


def ring_contains_segment(ring: np.ndarray, seg: np.ndarray) -> bool:
    """GEOS contains(polygon(ring), segment): segment inside the closed
    polygon, not entirely on its boundary, and not crossing outside."""
    s0, s1 = seg[0], seg[1]
    c0 = point_in_ring(s0[0], s0[1], ring)
    c1 = point_in_ring(s1[0], s1[1], ring)
    if c0 < 0 or c1 < 0:
        return False
    ringc = ring
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        ringc = np.vstack([ring, ring[:1]])
    # any proper crossing with the boundary => not contained
    for k in range(len(ringc) - 1):
        r0, r1 = ringc[k], ringc[k + 1]
        p = segment_intersection_point(s0, s1, r0, r1)
        if p is None:
            continue
        # touching at a point is fine unless the segment passes outside;
        # conservative exact handling: crossing strictly interior to the
        # segment with both sides — test midpoint of each sub-piece.
        if not (_pt_eq(p, (s0[0], s0[1])) or _pt_eq(p, (s1[0], s1[1]))):
            # split and test both halves' midpoints
            for q in ((0.5 * (s0[0] + p[0]), 0.5 * (s0[1] + p[1])),
                      (0.5 * (p[0] + s1[0]), 0.5 * (p[1] + s1[1]))):
                if point_in_ring(q[0], q[1], ring) < 0:
                    return False
    if c0 == 0 and c1 == 0:
        # both endpoints on boundary: interior of segment must be inside
        mid = (0.5 * (s0[0] + s1[0]), 0.5 * (s0[1] + s1[1]))
        if point_in_ring(mid[0], mid[1], ring) <= 0:
            return False
    return True


def ring_contains_point(ring: np.ndarray, pt) -> bool:
    """GEOS contains(polygon, point): strictly inside (boundary is not
    contained)."""
    return point_in_ring(pt[0], pt[1], ring) > 0
