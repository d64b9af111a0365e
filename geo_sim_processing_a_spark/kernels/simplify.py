"""Topology-preserving simplification kernels: Douglas-Peucker,
Visvalingam-Whyatt, and the invalid-polygon repair pass.

The reference delegates the DP kernel to QGIS's
QgsTopologyPreservingSimplifier (simplify_algorithm.py:209-213) and has
no unit tests for it; FIXTURES.md §G3 pins our behavior:

 1. iterative (stack-based) Douglas-Peucker per ring / line, vectorized
    point-to-chord distances;
 2. rings keep >= 4 points (closed) / lines >= 2; a simplified ring
    that self-intersects falls back to the unsimplified ring (the
    "topology-preserving" contract within one feature);
 3. invalid-polygon repair: interior rings that escape their exterior
    after simplification are deleted and counted.  NOTE the reference's
    own repair branch raises TypeError as written
    (``sort(key=polygon_area())``, simplify_algorithm.py:223,:265-266);
    we implement the documented intent — sort rings by ascending area,
    largest is the outer ring (FIXTURES.md §G3 records the divergence).

Visvalingam-Whyatt is not in the reference; BASELINE.json's north_star
names it.  Vertices are removed in ascending effective-area order until
every remaining vertex's triangle area >= area_tol.
"""

from __future__ import annotations

import numpy as np

from ..geom import primitives as P


# ---------------------------------------------------------------------------
# Douglas-Peucker
# ---------------------------------------------------------------------------

def _dp_mask(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Boolean keep-mask, iterative stack DP, vectorized distance."""
    n = len(coords)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    x, y = coords[:, 0], coords[:, 1]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        d2 = P.point_segment_dist2(x[i + 1:j], y[i + 1:j], x[i], y[i], x[j], y[j])
        k = int(np.argmax(d2))
        if d2[k] > tolerance * tolerance:
            k = i + 1 + k
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def _ring_self_intersects(ring: np.ndarray) -> bool:
    """Any proper crossing between non-adjacent ring segments (quadratic
    sweep — rings are small post-simplification)."""
    r = ring
    if r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]:
        r = np.vstack([r, r[:1]])
    m = len(r) - 1
    for i in range(m):
        for j in range(i + 2, m):
            if i == 0 and j == m - 1:
                continue
            p = P.segment_intersection_point(r[i], r[i + 1], r[j], r[j + 1])
            if p is not None:
                # NON-adjacent segments of a simple ring share no point
                # at all (adjacency and closure pairs are excluded by
                # the loop bounds), so ANY intersection — including one
                # at a vertex (a pinched/self-touching ring) — is a
                # violation.  The old endpoint-skip silently accepted
                # vertex-on-edge pinches.
                return True
            if P.collinear_overlap(r[i], r[i + 1], r[j], r[j + 1]):
                return True
    return False


def douglas_peucker_line(coords: np.ndarray, tolerance: float) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) <= 2:
        return coords
    return coords[_dp_mask(coords, tolerance)]


def douglas_peucker_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """DP on a closed ring: anchor at vertex 0 and the farthest vertex
    from it, simplify both halves; falls back to the input ring if the
    result is degenerate or self-intersecting."""
    ring = np.asarray(ring, dtype=np.float64)
    closed = ring[0, 0] == ring[-1, 0] and ring[0, 1] == ring[-1, 1]
    r = ring[:-1] if closed else ring
    n = len(r)
    if n <= 3:
        return ring
    d2 = (r[:, 0] - r[0, 0]) ** 2 + (r[:, 1] - r[0, 1]) ** 2
    piv = int(np.argmax(d2))
    if piv == 0:
        return ring
    half1 = douglas_peucker_line(r[: piv + 1], tolerance)
    half2 = douglas_peucker_line(np.vstack([r[piv:], r[:1]]), tolerance)
    out = np.vstack([half1[:-1], half2])
    if len(out) < 4 or P.ring_area(out) == 0.0 or _ring_self_intersects(out):
        return ring
    return out


# ---------------------------------------------------------------------------
# Visvalingam-Whyatt
# ---------------------------------------------------------------------------

def _triangle_areas(coords: np.ndarray) -> np.ndarray:
    a, b, c = coords[:-2], coords[1:-1], coords[2:]
    return 0.5 * np.abs((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))


def visvalingam_whyatt_line(coords: np.ndarray, area_tol: float) -> np.ndarray:
    """Drop the minimum-effective-area vertex until all interior
    vertices have triangle area >= area_tol (ties: lowest index)."""
    coords = np.asarray(coords, dtype=np.float64)
    pts = coords.copy()
    while len(pts) > 2:
        areas = _triangle_areas(pts)
        k = int(np.argmin(areas))
        if areas[k] >= area_tol:
            break
        pts = np.delete(pts, k + 1, axis=0)
    return pts


def visvalingam_whyatt_ring(ring: np.ndarray, area_tol: float) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    closed = ring[0, 0] == ring[-1, 0] and ring[0, 1] == ring[-1, 1]
    pts = ring[:-1] if closed else ring.copy()
    while len(pts) > 3:
        ext = np.vstack([pts[-1:], pts, pts[:1]])
        areas = _triangle_areas(ext)
        k = int(np.argmin(areas))
        if areas[k] >= area_tol:
            break
        pts = np.delete(pts, k, axis=0)
    out = np.vstack([pts, pts[:1]])
    if _ring_self_intersects(out) or P.ring_area(out) == 0.0:
        return ring
    return out


# ---------------------------------------------------------------------------
# invalid-polygon repair (simplify_algorithm.py:218-246, fixed intent)
# ---------------------------------------------------------------------------

def _ring_within(ring: np.ndarray, outer: np.ndarray) -> bool:
    """GEOS-``within``-style containment of a closed hole ring in a
    closed exterior ring: every vertex inside-or-ON the exterior
    (touching the boundary is allowed, as ``inner.within(outer)``
    allows), AND no hole edge properly crossing an exterior edge
    (an all-vertices-inside ring can still poke outside a concave
    exterior between vertices).  Quadratic edge sweep — rings are
    small post-simplification."""
    if len(ring) <= 1:
        return False
    sides = [P.point_in_ring(x, y, outer) for x, y in ring[:-1]]
    if any(s < 0 for s in sides):
        return False
    for i in range(len(ring) - 1):
        h0, h1 = ring[i], ring[i + 1]
        for j in range(len(outer) - 1):
            o0, o1 = outer[j], outer[j + 1]
            if P.collinear_overlap(h0, h1, o0, o1):
                continue  # running along the boundary is within
            p = P.segment_intersection_point(h0, h1, o0, o1)
            if p is None:
                continue
            endpoint = ((p[0] == h0[0] and p[1] == h0[1])
                        or (p[0] == h1[0] and p[1] == h1[1])
                        or (p[0] == o0[0] and p[1] == o0[1])
                        or (p[0] == o1[0] and p[1] == o1[1]))
            if not endpoint:
                return False  # proper crossing: pokes outside
    if any(s > 0 for s in sides):
        return True
    # every vertex ON the boundary: decide by an edge midpoint
    mx = (ring[0, 0] + ring[1, 0]) / 2.0
    my = (ring[0, 1] + ring[1, 1]) / 2.0
    return P.point_in_ring(mx, my, outer) >= 0


def _ring_intersects_hole_interior(ring: np.ndarray, hole: np.ndarray) -> bool:
    """Does ``ring``'s area reach into ``hole``'s OPEN interior?  Used
    for within-semantics against a polygon-under-construction: a hole's
    interior is OUTSIDE the polygon, so a candidate ring poking into it
    is not ``within``.  Touching the hole from outside (shared vertex /
    shared boundary run) is fine — that leaves the candidate inside the
    polygon's closure."""
    if len(ring) <= 1:
        return False
    sides = [P.point_in_ring(x, y, hole) for x, y in ring[:-1]]
    if any(s > 0 for s in sides):
        return True  # a vertex strictly inside the hole
    # No vertex inside: an edge can still transit the interior —
    # through proper crossings, as a chord between boundary points, or
    # entering EXACTLY through hole vertices (an endpoint-equality
    # "touch" test missed that last case, review r5: edge
    # (5,5)→(55,55) across a (10,10)-(50,50) square meets the boundary
    # only at two corners).  Exhaustive per-edge check: split the edge
    # at every boundary meeting point and test each open interval's
    # midpoint for strict insidedness.
    for i in range(len(ring) - 1):
        h0, h1 = ring[i], ring[i + 1]
        dx, dy = h1[0] - h0[0], h1[1] - h0[1]
        d2 = dx * dx + dy * dy
        if d2 == 0.0:
            continue

        def t_of(px, py):
            return min(1.0, max(0.0, ((px - h0[0]) * dx + (py - h0[1]) * dy)
                                / d2))

        ts = [0.0, 1.0]
        for j in range(len(hole) - 1):
            o0, o1 = hole[j], hole[j + 1]
            if P.collinear_overlap(h0, h1, o0, o1):
                # running along the boundary: its endpoints bound the
                # overlap run (midpoints of the run sit ON the
                # boundary, which point_in_ring reports as 0 — allowed)
                ts.append(t_of(o0[0], o0[1]))
                ts.append(t_of(o1[0], o1[1]))
                continue
            p = P.segment_intersection_point(h0, h1, o0, o1)
            if p is not None:
                ts.append(t_of(p[0], p[1]))
        ts.sort()
        for t0, t1 in zip(ts, ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            tm = (t0 + t1) / 2.0
            if P.point_in_ring(h0[0] + tm * dx, h0[1] + tm * dy, hole) > 0:
                return True
    return False


def repair_polygon(rings: list) -> tuple[list, int]:
    """Re-assemble a possibly-invalid simplified polygon: the largest
    ring becomes the exterior; interior rings are kept iff they are
    within the POLYGON UNDER CONSTRUCTION — the reference's
    ``inner.within(s_geom_outer)`` where s_geom_outer already includes
    previously-accepted holes (``sim_geom_algorithm`` repair loop).
    Concretely: within the exterior (boundary touching allowed, proper
    edge crossings rejected) AND not reaching into the open interior of
    any already-kept hole — a kept hole's interior is outside the
    polygon, so a ring nested inside one is deleted (ADVICE r4; holes
    are processed largest-first so the container hole is always seen
    before its nested candidate).  Returns (rings, nbr_holes_deleted)."""
    if len(rings) <= 1:
        return rings, 0
    order = sorted(range(len(rings)), key=lambda i: P.ring_area(rings[i]))
    outer = rings[order[-1]]
    kept = [outer]
    deleted = 0
    for i in reversed(order[:-1]):
        cand = rings[i]
        if (_ring_within(cand, outer)
                and not any(_ring_intersects_hole_interior(cand, hole)
                            for hole in kept[1:])):
            kept.append(cand)
        else:
            deleted += 1
    return kept, deleted


def simplify_feature(rings: list, kind: int, tolerance: float,
                     method: str = "dp") -> tuple[list, int]:
    """Simplify one feature (kind per kernels.reduce_bend constants).
    Returns (rings, nbr_holes_deleted)."""
    if kind == 0:  # point
        return rings, 0
    if method == "vw":
        area_tol = tolerance * tolerance
        if kind == 1:
            return [visvalingam_whyatt_line(rings[0], area_tol)], 0
        simp = [visvalingam_whyatt_ring(r, area_tol) for r in rings]
    else:
        if kind == 1:
            return [douglas_peucker_line(rings[0], tolerance)], 0
        simp = [douglas_peucker_ring(r, tolerance) for r in rings]
    return repair_polygon(simp)
