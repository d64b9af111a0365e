"""From-scratch polygon triangulation (ear clipping + Lawson flips).

The reference outsources tessellation to QGIS ``3d:tessellate``
(chordal_axis_algorithm.py:503-575, a poly2tri CDT).  The chordal-axis
goldens embed that triangulation, which is Delaunay; for the cocircular
(ambiguous) quads in the fixtures poly2tri picks the "\\" diagonal
(top-left to bottom-right).  We reproduce that with:

 1. ear clipping of the (optionally hole-bridged) ring,
 2. Lawson edge flips to the constrained Delaunay triangulation,
 3. cocircular tie-break: prefer the negative-slope diagonal.

Verified triangle-for-triangle against the 11 chordal-axis goldens
(chordal_axis_unittest.py:136-250).
"""

from __future__ import annotations

import numpy as np

from ..geom import primitives as P


def _ring_open(ring: np.ndarray) -> np.ndarray:
    if len(ring) >= 2 and ring[0, 0] == ring[-1, 0] and ring[0, 1] == ring[-1, 1]:
        return ring[:-1]
    return ring


def _is_ear(ptsf: list, idx: list, i: int, ccw: bool) -> bool:
    """``ptsf`` is the ring as a list of [x, y] float pairs — the
    containment test is scalar float arithmetic (the edge cross
    products are the SAME expressions point_in_ring evaluates, so
    boundary decisions agree); a numpy PIP here measured ~60 us/call
    on 3-point rings vs ~1 us scalar (round-2 playbook: tiny-n numpy
    dispatch dominates the flops)."""
    n = len(idx)
    ax, ay = ptsf[idx[i - 1]]
    bx, by = ptsf[idx[i]]
    cx, cy = ptsf[idx[(i + 1) % n]]
    cross = P.orient(ax, ay, cx, cy, bx, by)
    # convex test: vertex b must be on the proper side
    if ccw:
        if cross >= 0:  # reflex or collinear
            return False
    else:
        if cross <= 0:
            return False
    skip = (i - 1 if i - 1 >= 0 else n - 1, i, (i + 1) % n)
    for k in range(n):
        if k in skip:
            continue
        px, py = ptsf[idx[k]]
        if (px == ax and py == ay) or (px == bx and py == by) \
                or (px == cx and py == cy):
            continue
        # inside-or-on-boundary iff the three edge orientations are not
        # strictly mixed-sign (works for either ring orientation)
        d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        d2 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
        d3 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        if (d1 < 0 or d2 < 0 or d3 < 0) and (d1 > 0 or d2 > 0 or d3 > 0):
            continue  # strictly outside
        return False
    return True


def _ear_clip(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Ear-clip an open ring; returns index triples."""
    n = len(pts)
    area = P.signed_area(pts)
    ccw = area > 0
    ptsf = pts.tolist()  # scalar-float hot path (see _is_ear)
    idx = list(range(n))
    tris: list[tuple[int, int, int]] = []
    guard = 0
    i = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        m = len(idx)
        i = i % m
        if _is_ear(ptsf, idx, i, ccw):
            tris.append((idx[i - 1], idx[i], idx[(i + 1) % m]))
            del idx[i]
            i = max(i - 1, 0)
        else:
            i += 1
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return tris


def _incircle(a, b, c, d) -> float:
    """>0 iff d strictly inside circumcircle of CCW triangle (a,b,c)."""
    adx, ady = a[0] - d[0], a[1] - d[1]
    bdx, bdy = b[0] - d[0], b[1] - d[1]
    cdx, cdy = c[0] - d[0], c[1] - d[1]
    ad2 = adx * adx + ady * ady
    bd2 = bdx * bdx + bdy * bdy
    cd2 = cdx * cdx + cdy * cdy
    return (adx * (bdy * cd2 - cdy * bd2)
            - ady * (bdx * cd2 - cdx * bd2)
            + ad2 * (bdx * cdy - cdx * bdy))


def _lawson(pts: np.ndarray, tris: list, constrained: set) -> list:
    """Flip internal edges to (tie-broken) Delaunay."""
    diam = float(np.hypot(pts[:, 0].max() - pts[:, 0].min(),
                          pts[:, 1].max() - pts[:, 1].min())) or 1.0
    tol = 1e-12 * diam ** 4

    tris = [tuple(t) for t in tris]
    changed = True
    rounds = 0
    while changed and rounds < 200:
        changed = False
        rounds += 1
        edge_map: dict[tuple, list[int]] = {}
        for ti, t in enumerate(tris):
            for k in range(3):
                e = tuple(sorted((t[k], t[(k + 1) % 3])))
                edge_map.setdefault(e, []).append(ti)
        for e, owners in edge_map.items():
            if len(owners) != 2 or e in constrained:
                continue
            t1, t2 = tris[owners[0]], tris[owners[1]]
            i, j = e
            k1 = next(v for v in t1 if v not in e)
            k2 = next(v for v in t2 if v not in e)
            if k1 == k2:
                continue
            a, b, c, d = pts[i], pts[k1], pts[j], pts[k2]
            # quad a(k1-side b) c(k2-side d); current diagonal (i,j)=(a,c)
            # quad must be strictly convex for a legal flip
            o1 = P.orient(b[0], b[1], d[0], d[1], a[0], a[1])
            o2 = P.orient(b[0], b[1], d[0], d[1], c[0], c[1])
            if not (o1 > 0) == (o2 < 0) or o1 == 0 or o2 == 0:
                continue
            # orient triangle (a, b, c) CCW for incircle
            if P.orient(a[0], a[1], b[0], b[1], c[0], c[1]) > 0:
                ic = _incircle(a, b, c, d)
            else:
                ic = _incircle(a, c, b, d)
            do_flip = False
            if ic > tol:
                do_flip = True
            elif abs(ic) <= tol:
                # cocircular: prefer the negative-slope ("\\") diagonal
                cur = (pts[j][0] - pts[i][0]) * (pts[j][1] - pts[i][1])
                alt = (pts[k2][0] - pts[k1][0]) * (pts[k2][1] - pts[k1][1])
                if cur > 0 and alt < 0:
                    do_flip = True
            if do_flip:
                tris[owners[0]] = (k1, i, k2)
                tris[owners[1]] = (k1, k2, j)
                changed = True
                break  # edge_map stale; rebuild
    return tris


def _bridge_holes(outer: np.ndarray, holes: list) -> np.ndarray:
    """Connect each hole to the outer ring with a two-way bridge at the
    closest mutually visible vertex pair (simple deterministic variant;
    chordal-axis goldens have no holes)."""
    ring = outer
    remaining = sorted(holes, key=lambda h: -float(h[:, 0].max()))
    for hole in remaining:
        hi = int(np.argmax(hole[:, 0]))
        hx, hy = hole[hi]
        # nearest outer vertex to the hole's rightmost vertex
        d2 = (ring[:, 0] - hx) ** 2 + (ring[:, 1] - hy) ** 2
        oi = int(np.argmin(d2))
        # splice: ring[:oi+1] + hole[hi:] + hole[:hi+1] + ring[oi:]
        hole_cycle = np.vstack([hole[hi:], hole[:hi + 1]])
        ring = np.vstack([ring[:oi + 1], hole_cycle, ring[oi:]])
    return ring


def tessellate(rings: list) -> list[np.ndarray]:
    """Triangulate a polygon (list of rings, exterior first, closed or
    open).  Returns a list of (3,2) float64 triangle arrays."""
    outer = _ring_open(np.asarray(rings[0], dtype=np.float64))
    # normalize winding: outer CCW, holes CW (the bridge splice and the
    # ear tests assume opposite windings — a hole wound LIKE the outer
    # ring was silently triangulated as filled area).  Reverse-then-roll
    # keeps the start vertex, so correctly-wound input is bit-unchanged.
    if P.signed_area(outer) < 0.0:
        outer = np.roll(outer[::-1], 1, axis=0)
    holes = []
    for r in rings[1:]:
        h = _ring_open(np.asarray(r, dtype=np.float64))
        if P.signed_area(h) > 0.0:
            h = np.roll(h[::-1], 1, axis=0)
        holes.append(h)
    if holes:
        ring = _bridge_holes(outer, holes)
    else:
        ring = outer
    if holes:
        # drop exact duplicate consecutive vertices (bridge splices
        # create them); bridged rings legitimately repeat
        # non-consecutive vertices — ear clipping works on indices
        keep = [0]
        for k in range(1, len(ring)):
            if ring[k, 0] != ring[keep[-1], 0] or ring[k, 1] != ring[keep[-1], 1]:
                keep.append(k)
        pts = ring[keep]
    else:
        pts = ring
    tris = _ear_clip(pts)
    constrained = set()
    m = len(pts)
    for k in range(m):
        constrained.add(tuple(sorted((k, (k + 1) % m))))
    tris = _lawson(pts, tris, constrained)
    out = []
    for t in tris:
        tri = pts[list(t)]
        if P.ring_area(tri) > 0.0:
            out.append(tri)
    return out
