"""Vectorized planar-geometry primitives (pure NumPy, float64).

Formula provenance is cited per function against the reference
(/root/reference) or the public QGIS API it calls, because vertex-level
output parity depends on replicating the exact arithmetic.
"""

from __future__ import annotations

import math

import numpy as np

TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# angles
# ---------------------------------------------------------------------------

def normalized_angle(angle: np.ndarray | float):
    """QgsGeometryUtils::normalizedAngle — clamp into [0, 2*pi)."""
    a = np.mod(angle, TWO_PI)
    # np.mod already yields [0, 2pi) for negative inputs; keep exact 2pi -> 0
    return np.where(a == TWO_PI, 0.0, a) if isinstance(a, np.ndarray) else (0.0 if a == TWO_PI else a)


def angle_between_three_points(x1, y1, x2, y2, x3, y3):
    """QgsGeometryUtils::angleBetweenThreePoints (public QGIS API used at
    reduce_bend_algorithm.py:1156): normalized(atan2(y1-y2, x1-x2) -
    atan2(y3-y2, x3-x2)). Vectorized."""
    a1 = np.arctan2(np.asarray(y1) - y2, np.asarray(x1) - x2)
    a2 = np.arctan2(np.asarray(y3) - y2, np.asarray(x3) - x2)
    return normalized_angle(a1 - a2)


def vertex_angles(coords: np.ndarray, is_closed: bool) -> np.ndarray:
    """Angle at each vertex of a polyline (ReduceBend.get_angles,
    reduce_bend_algorithm.py:1137-1162).

    Open line: angles for vertices 1..n-2.
    Closed line: second-to-last vertex is prepended for circularity,
    giving angles for vertices 0..n-2 (start/end angle first).
    Lines with < 3 vertices have no angles.
    """
    n = len(coords)
    if n < 3:
        return np.empty(0, dtype=np.float64)
    xy = coords
    if is_closed:
        xy = np.vstack([coords[-2:-1], coords])
    px, py = xy[:-2, 0], xy[:-2, 1]
    cx, cy = xy[1:-1, 0], xy[1:-1, 1]
    nx, ny = xy[2:, 0], xy[2:, 1]
    return angle_between_three_points(px, py, cx, cy, nx, ny)


# ---------------------------------------------------------------------------
# areas / lengths / centroids
# ---------------------------------------------------------------------------

def _rot1(a: np.ndarray) -> np.ndarray:
    """a rotated left by one — value-identical to np.roll(a, -1) but
    without roll's normalize/concatenate machinery (hot path: the
    kernels call the area/centroid helpers tens of thousands of times
    per tile batch)."""
    out = np.empty_like(a)
    out[:-1] = a[1:]
    out[-1] = a[0]
    return out


def signed_area(coords: np.ndarray) -> float:
    """Signed shoelace area of a ring; auto-closes (QgsPolygon closes an
    open ring, see comment at reduce_bend_algorithm.py:763)."""
    x, y = coords[:, 0], coords[:, 1]
    return 0.5 * float(np.dot(x, _rot1(y)) - np.dot(_rot1(x), y))


def ring_area(coords: np.ndarray) -> float:
    """Absolute ring area (QgsPolygon::area of a single-ring polygon)."""
    return abs(signed_area(coords))


def polyline_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def ring_perimeter(coords: np.ndarray) -> float:
    """Perimeter including the auto-closing segment."""
    d = np.diff(np.vstack([coords, coords[:1]]), axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def ring_centroid(coords: np.ndarray) -> tuple[float, float]:
    """Area-weighted polygon centroid (GEOS Centroid for a simple ring).
    Falls back to the vertex mean for degenerate (zero-area) rings."""
    x, y = coords[:, 0], coords[:, 1]
    x2, y2 = _rot1(x), _rot1(y)
    cross = x * y2 - x2 * y
    a = cross.sum() / 2.0
    if a == 0.0:
        return float(x.mean()), float(y.mean())
    cx = float(((x + x2) * cross).sum() / (6.0 * a))
    cy = float(((y + y2) * cross).sum() / (6.0 * a))
    return cx, cy


def bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(coords[:, 0].min()),
        float(coords[:, 1].min()),
        float(coords[:, 0].max()),
        float(coords[:, 1].max()),
    )


def is_closed(coords: np.ndarray) -> bool:
    return len(coords) >= 2 and coords[0, 0] == coords[-1, 0] and coords[0, 1] == coords[-1, 1]


# ---------------------------------------------------------------------------
# affine (must match QgsGeometry.rotate / translate semantics,
# used by the smoothing kernel — reduce_bend_algorithm.py:915-972)
# ---------------------------------------------------------------------------

def rotate_cw(coords: np.ndarray, degrees_cw: float) -> np.ndarray:
    """QgsGeometry::rotate(angle, center=(0,0)): clockwise for positive
    angle, in degrees.  QGIS delegates to QTransform::rotate(-angle),
    which special-cases exact right angles (sin/cos of ±90/±180/±270 set
    to exact 0/±1) — replicated here because the smoothing goldens
    (reduce_bend_unittest.py:371-410) are sensitive at the ULP level."""
    a = -degrees_cw
    if a == 0.0:
        return coords.copy()
    if a == 90. or a == -270.:
        sina, cosa = 1.0, 0.0
    elif a == 270. or a == -90.:
        sina, cosa = -1.0, 0.0
    elif a == 180. or a == -180.:
        sina, cosa = 0.0, -1.0
    else:
        b = math.radians(a)
        sina, cosa = math.sin(b), math.cos(b)
    x, y = coords[:, 0], coords[:, 1]
    # QTransform maps (x, y) -> (cosa*x - sina*y, sina*x + cosa*y)
    return np.column_stack([cosa * x - sina * y, sina * x + cosa * y])


# ---------------------------------------------------------------------------
# segment predicates
# ---------------------------------------------------------------------------

def orient(ax, ay, bx, by, px, py):
    """Sign of cross((b-a), (p-a)) — vectorized."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def on_segment(ax, ay, bx, by, px, py) -> bool:
    """Exact: p collinear with and within segment ab (scalar)."""
    if orient(ax, ay, bx, by, px, py) != 0.0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def segments_intersect(p1, p2, p3, p4) -> bool:
    """True iff segment p1p2 and p3p4 share at least one point (incl.
    endpoints / collinear overlap). Scalar, exact float predicates."""
    d1 = orient(p3[0], p3[1], p4[0], p4[1], p1[0], p1[1])
    d2 = orient(p3[0], p3[1], p4[0], p4[1], p2[0], p2[1])
    d3 = orient(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1])
    d4 = orient(p1[0], p1[1], p2[0], p2[1], p4[0], p4[1])
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
        return True
    if d1 == 0 and on_segment(p3[0], p3[1], p4[0], p4[1], p1[0], p1[1]):
        return True
    if d2 == 0 and on_segment(p3[0], p3[1], p4[0], p4[1], p2[0], p2[1]):
        return True
    if d3 == 0 and on_segment(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1]):
        return True
    if d4 == 0 and on_segment(p1[0], p1[1], p2[0], p2[1], p4[0], p4[1]):
        return True
    return False


def segment_intersection_point(p1, p2, p3, p4):
    """Proper (non-collinear) crossing point of two segments, or None.
    Endpoint touches count (the point is returned); collinear overlaps
    return None (dimension-1 intersections handled separately)."""
    d1 = orient(p3[0], p3[1], p4[0], p4[1], p1[0], p1[1])
    d2 = orient(p3[0], p3[1], p4[0], p4[1], p2[0], p2[1])
    d3 = orient(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1])
    d4 = orient(p1[0], p1[1], p2[0], p2[1], p4[0], p4[1])
    if d1 == 0 and d2 == 0 and d3 == 0 and d4 == 0:
        return None  # collinear
    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and ((d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0):
        denom = d1 - d2
        if denom == 0.0:
            # p1p2 endpoint lies on p3p4
            if d1 == 0:
                return (p1[0], p1[1])
            return (p2[0], p2[1])
        t = d1 / denom
        if not (0.0 <= t <= 1.0):
            return None
        return (p1[0] + t * (p2[0] - p1[0]), p1[1] + t * (p2[1] - p1[1]))
    return None


def collinear_overlap(p1, p2, p3, p4) -> bool:
    """True iff the two segments are collinear and overlap over a
    positive length (a dimension-1 intersection)."""
    if orient(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1]) != 0.0:
        return False
    if orient(p1[0], p1[1], p2[0], p2[1], p4[0], p4[1]) != 0.0:
        return False
    # project on dominant axis
    if abs(p2[0] - p1[0]) >= abs(p2[1] - p1[1]):
        a0, a1 = sorted((p1[0], p2[0]))
        b0, b1 = sorted((p3[0], p4[0]))
    else:
        a0, a1 = sorted((p1[1], p2[1]))
        b0, b1 = sorted((p3[1], p4[1]))
    lo, hi = max(a0, b0), min(a1, b1)
    return hi > lo


# ---------------------------------------------------------------------------
# point-in-polygon (scalar ring variant + vectorized batch variant)
# ---------------------------------------------------------------------------

def point_in_ring(px: float, py: float, ring: np.ndarray) -> int:
    """+1 strictly inside, 0 on boundary, -1 outside. Ring may be open
    (auto-closed). Crossing-number with exact boundary detection."""
    x, y = ring[:, 0], ring[:, 1]
    if x[0] != x[-1] or y[0] != y[-1]:
        x = np.append(x, x[0])
        y = np.append(y, y[0])
    x0, y0, x1, y1 = x[:-1], y[:-1], x[1:], y[1:]
    # boundary test
    cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    on = (cross == 0.0) & (np.minimum(x0, x1) <= px) & (px <= np.maximum(x0, x1)) \
        & (np.minimum(y0, y1) <= py) & (py <= np.maximum(y0, y1))
    if on.any():
        return 0
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    crossings = int(np.count_nonzero(cond & (px < xint)))
    return 1 if crossings % 2 == 1 else -1


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number PIP for many points vs one ring.
    Returns boolean strictly-inside-or-on-boundary? No — strictly the
    crossing-number parity (boundary points get parity-dependent
    results; feed boundary-free data or use point_in_ring)."""
    x, y = ring[:, 0], ring[:, 1]
    if x[0] != x[-1] or y[0] != y[-1]:
        x = np.append(x, x[0])
        y = np.append(y, y[0])
    x0, y0 = x[:-1][None, :], y[:-1][None, :]
    x1, y1 = x[1:][None, :], y[1:][None, :]
    ppx, ppy = px[:, None], py[:, None]
    cond = (y0 > ppy) != (y1 > ppy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (ppy - y0) * (x1 - x0) / (y1 - y0)
    inside = np.count_nonzero(cond & (ppx < xint), axis=1) % 2 == 1
    return inside


# ---------------------------------------------------------------------------
# point / polyline distance helpers
# ---------------------------------------------------------------------------

def point_segment_dist2(px, py, ax, ay, bx, by):
    """Squared distance from point(s) to segment(s) — vectorized."""
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / ln2
    t = np.where(ln2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    qx, qy = ax + t * dx, ay + t * dy
    return (px - qx) ** 2 + (py - qy) ** 2


def point_polyline_dist(px: float, py: float, coords: np.ndarray) -> float:
    if len(coords) == 1:
        return math.hypot(px - coords[0, 0], py - coords[0, 1])
    d2 = point_segment_dist2(px, py, coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1])
    return float(np.sqrt(d2.min()))


def point_on_polyline(px: float, py: float, coords: np.ndarray) -> bool:
    """Exact membership of a point on a polyline."""
    for k in range(len(coords) - 1):
        if on_segment(coords[k, 0], coords[k, 1], coords[k + 1, 0], coords[k + 1, 1], px, py):
            return True
    return False


def split_rings(x, y, offsets):
    """Flat (xs, ys, ring_offsets) -> list of (n,2) ring arrays — THE
    decoder for the engine's columnar multi-ring geometry (one
    definition; the tile kernels and the spatial joins both use it)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    offs = np.asarray(offsets, dtype=np.int64)
    ends = np.append(offs[1:], len(x))
    return [np.column_stack([x[offs[k]:ends[k]], y[offs[k]:ends[k]]])
            for k in range(len(offs))]
