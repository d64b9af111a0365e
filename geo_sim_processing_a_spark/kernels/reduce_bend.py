"""Sherbend (Wang–Müller) bend reduction — from-scratch NumPy kernel.

Semantics replicate the reference algorithm
(/root/reference/reduce_bend_algorithm.py) decision-for-decision so the
32 golden unit tests produce identical vertex sequences, but the
implementation is new: ragged NumPy coordinate arrays, vectorized angle
/ area math, and tile-local segment sets instead of a mutable global
QgsSpatialIndex (SURVEY.md §2.3-§2.4).

Key replicated behaviors (file:line refer to the reference):
 - epsilon rule                          reduce_bend_algorithm.py:1045-1088
 - duplicate-node removal               :1630-1634
 - co-linear vertex deletion (+ closed wrap case)  :1713-1752
 - bend detection via orientation inflexions        :1334-1384
 - closed-line pivot                                 :1299-1332
 - greedy non-adjacent flagging sorted by adj_area   :1219-1273
 - constraint order simplicity→alternates→intersection→sidedness :1793-1847
 - the reference's use of the ORIGINAL bend's subline/polygon for the
   intersection & sidedness checks even after an alternate bend was
   substituted (local `bend` binding at :1817 is not refreshed)
 - reversed bend processing within a line            :1893-1916
 - fixpoint loop with min 2 passes                   :1664-1699
 - smoothing geometry cases 1-3 with exact trig      :791-1006

Intentional, documented divergences:
 - a zero-area bend would raise ZeroDivisionError in the reference's
   adjusted-area formula (:1202-1217); we define adj_area = 0.0 there.
 - `_resolve_non_valid_polygon` (:844-879) uses GEOS polygonize; we
   split the (only possible) bow-tie case directly, same accept/reject.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..geom.epsilon import Epsilon
from ..geom import primitives as P
from ..geom import relate as R

KIND_POINT = 0
KIND_LINE = 1
KIND_POLYGON = 2

CLOCK_WISE = 0
ANTI_CLOCK_WISE = -1


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------

@dataclass
class Feature:
    """One input feature: kind + rings (polygon: exterior first, closed;
    line: single entry; point: single (1,2) array). ``attrs`` is opaque
    and passed through untouched (SURVEY.md §1.1)."""

    kind: int
    rings: list  # list[np.ndarray (n,2) float64]
    attrs: object = None


class _Geom:
    """Mutable linestring under reduction (reference RbGeom, :685-739)."""

    __slots__ = ("gid", "original_kind", "coords", "is_simplest", "need_pivot",
                 "bends", "_seg_bbox", "_bbox", "_xs_list", "_ys_list",
                 "length_checked")

    def __init__(self, gid: int, original_kind: int, coords: np.ndarray, eps: Epsilon):
        self.gid = gid
        self.original_kind = original_kind
        self.coords = np.asarray(coords, dtype=np.float64)
        self.is_simplest = False
        self.need_pivot = False
        self.bends = []
        self._seg_bbox = None
        self._bbox = None
        self._xs_list = None
        self._ys_list = None
        self.length_checked = False
        if original_kind == KIND_POINT:
            self.is_simplest = True
        elif original_kind == KIND_LINE:
            if P.polyline_length(self.coords) >= eps.zero_relative:
                if P.is_closed(self.coords):
                    if abs(P.signed_area(self.coords)) > eps.zero_relative:
                        self.need_pivot = True
                    else:
                        self.is_simplest = True
                # open line: neither flag
            else:
                self.is_simplest = True
        elif original_kind == KIND_POLYGON:
            if P.ring_area(self.coords) > eps.zero_relative:
                self.need_pivot = True
            else:
                self.is_simplest = True

    def invalidate(self):
        self._seg_bbox = None
        self._bbox = None
        self._xs_list = None
        self._ys_list = None
        self.length_checked = False

    def coord_lists(self):
        """Coordinates as plain Python float lists, cached until
        mutation — the constraint hot loops run on interpreter floats
        (numpy dispatch on < 20-element candidate sets costs more than
        the arithmetic; measured both ways)."""
        if self._xs_list is None:
            self._xs_list = self.coords[:, 0].tolist()
            self._ys_list = self.coords[:, 1].tolist()
        return self._xs_list, self._ys_list

    def bbox(self):
        """Whole-geometry bbox, cached — the coarse prefilter standing
        in for the reference's R-tree (reduce_bend_algorithm.py:481-534):
        a geometry whose bbox misses the query rect has no segment in it."""
        if self._bbox is None:
            c = self.coords
            self._bbox = (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())
        return self._bbox

    def seg_bbox(self):
        """(nseg,4) per-segment bbox array, cached until mutation."""
        if self._seg_bbox is None:
            c = self.coords
            x0, y0 = c[:-1, 0], c[:-1, 1]
            x1, y1 = c[1:, 0], c[1:, 1]
            self._seg_bbox = np.column_stack([
                np.minimum(x0, x1), np.minimum(y0, y1),
                np.maximum(x0, x1), np.maximum(y0, y1)])
        return self._seg_bbox


class _Bend:
    """Reference Bend (:742-781)."""

    __slots__ = ("i", "j", "pts", "area", "_perimeter", "_adj_area", "to_reduce",
                 "_xs", "_ys", "_lo", "_hi")

    def __init__(self, i: int, j: int, pts: np.ndarray, xs: list = None,
                 ys: list = None):
        """``pts`` is a VIEW of the geometry's coords (safe: every
        mutation replaces the coords array, never writes in place).
        ``xs``/``ys`` are the geometry's cached Python-float lists —
        area runs as an interpreter-float shoelace (bends average ~6
        vertices; numpy dot dispatch costs more than the arithmetic,
        and the full-workload output fingerprint is unchanged)."""
        self.i = i
        self.j = j
        self.pts = pts
        if xs is None:
            xs = pts[:, 0].tolist()
            ys = pts[:, 1].tolist()
            lo, hi = 0, len(xs) - 1
        else:
            lo, hi = i, j
        # area eagerly (every bend is filtered/pivot-compared on area);
        # perimeter/adj_area lazily (only candidate bends need them)
        s1 = 0.0
        s2 = 0.0
        xk, yk = xs[lo], ys[lo]
        for k in range(lo + 1, hi + 1):
            xn, yn = xs[k], ys[k]
            s1 += xk * yn
            s2 += xn * yk
            xk, yk = xn, yn
        s1 += xk * ys[lo]
        s2 += xs[lo] * yk
        self.area = abs(0.5 * (s1 - s2))
        self._xs, self._ys, self._lo, self._hi = xs, ys, lo, hi
        self._perimeter = None
        self._adj_area = None
        self.to_reduce = False

    @property
    def perimeter(self) -> float:
        if self._perimeter is None:
            xs, ys, lo, hi = self._xs, self._ys, self._lo, self._hi
            s = 0.0
            xk, yk = xs[lo], ys[lo]
            for k in range(lo + 1, hi + 1):
                xn, yn = xs[k], ys[k]
                dx, dy = xn - xk, yn - yk
                s += math.sqrt(dx * dx + dy * dy)
                xk, yk = xn, yn
            dx, dy = xs[lo] - xk, ys[lo] - yk
            s += math.sqrt(dx * dx + dy * dy)
            self._perimeter = s
        return self._perimeter

    @property
    def adj_area(self) -> float:
        if self._adj_area is None:
            self._adj_area = calculate_adj_area(self.area, self.perimeter)
        return self._adj_area

    def bbox_f(self):
        """(xmin, ymin, xmax, ymax) from the cached float lists."""
        xs = self._xs[self._lo:self._hi + 1]
        ys = self._ys[self._lo:self._hi + 1]
        return (min(xs), min(ys), max(xs), max(ys))

    def chord_f(self):
        """The replacement chord endpoints as plain floats."""
        return (self._xs[self._lo], self._ys[self._lo],
                self._xs[self._hi], self._ys[self._hi])

    @property
    def new_subline(self) -> np.ndarray:
        return np.vstack([self.pts[:1], self.pts[-1:]])

    @property
    def old_subline(self) -> np.ndarray:
        return self.pts


@dataclass
class _BendReduced:
    """Reference BendReduced (:784-1006)."""

    geom: _Geom
    pt_start: np.ndarray
    pt_end: np.ndarray
    bend_ring: np.ndarray
    i: int | None = None
    j: int | None = None
    is_line_smoothable: bool | None = None
    smooth_line: np.ndarray | None = None
    smooth_parts: list = field(default_factory=list)


@dataclass
class ReduceBendResult:
    features: list
    in_nbr_features: int = 0
    out_nbr_features: int = 0
    nbr_bend_reduced: list = field(default_factory=list)
    nbr_bend_detected: list = field(default_factory=list)
    nbr_hole_del: int = 0
    nbr_pol_del: int = 0
    nbr_pass: int = 0
    nbr_line_smooth: int = 0


# ---------------------------------------------------------------------------
# scalar helpers (exact formula order matters)
# ---------------------------------------------------------------------------

def calculate_adj_area(area: float, perimeter: float) -> float:
    """Reference :1202-1217. Divergence: zero-area bend => 0.0 (the
    reference would raise ZeroDivisionError)."""
    if area == 0.0 or perimeter == 0.0:
        return 0.0
    compactness_index = 4 * area * math.pi / perimeter ** 2
    return area * (.75 / compactness_index)


def calculate_min_adj_area(diameter_tol: float) -> float:
    """Reference :1386-1397."""
    return .75 * math.pi * (diameter_tol / 2.) ** 2


def _remove_duplicate_nodes(coords: np.ndarray, epsilon: float) -> np.ndarray:
    """QgsLineString::removeDuplicateNodes(epsilon): drop a vertex within
    epsilon of the previously kept one; first and last are never removed."""
    n = len(coords)
    if n <= 2:
        return coords
    keep = [0]
    e2 = epsilon * epsilon
    for k in range(1, n - 1):
        dx = coords[k, 0] - coords[keep[-1], 0]
        dy = coords[k, 1] - coords[keep[-1], 1]
        if dx * dx + dy * dy > e2:
            keep.append(k)
    keep.append(n - 1)
    if len(keep) == n:
        return coords
    return coords[keep]


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

class ReduceBend:
    """One bend-reduction run over a co-located set of features (one
    tile's features when called from Spark; the whole dataset in unit
    tests — semantics identical since constraint checks only consult
    bbox-overlapping segments, SURVEY.md §3.3)."""

    def __init__(self, features: list, diameter_tol: float, smooth_line=False,
                 flag_del_outer=False, flag_del_inner=False, epsilon: Epsilon | None = None):
        self.features = [Feature(f.kind, [np.asarray(r, dtype=np.float64) for r in f.rings], f.attrs)
                         for f in features]
        self.diameter_tol = float(diameter_tol)
        self.smooth_line = smooth_line
        self.flag_del_outer = flag_del_outer
        self.flag_del_inner = flag_del_inner
        self.eps = epsilon or Epsilon.from_coords([r for f in features for r in f.rings])
        self.res = ReduceBendResult(features=[])
        self.geoms: list[_Geom] = []
        self.feature_geoms: list[list[_Geom]] = []
        self.bends_reduced: list[_BendReduced] = []
        # vectorized candidate search: one (G,4) bbox matrix + kind
        # array, rows updated in place on mutation (the engine's
        # replacement for the reference's R-tree coarse filter)
        self._bbox_arr: np.ndarray | None = None
        self._kind_arr: np.ndarray | None = None
        self._gid_row: dict[int, int] = {}

    # -- lifecycle ----------------------------------------------------------

    def reduce(self) -> ReduceBendResult:
        self.res.in_nbr_features = len(self.features)
        if self.flag_del_outer or self.flag_del_inner:
            self._del_outer_inner_ring()
        self._create_geoms()
        self._pre_reduction()
        self._manage_reduce_bend()
        if self.smooth_line:
            self._manage_smooth_line()
        self._rebuild_features()
        self.res.out_nbr_features = len(self.res.features)
        return self.res

    def _del_outer_inner_ring(self):
        """Reference :1638-1662 (pre-geom deletion pass)."""
        min_adj_area = calculate_min_adj_area(self.diameter_tol)
        for i in reversed(range(len(self.features))):
            f = self.features[i]
            if f.kind != KIND_POLYGON:
                continue
            for j in reversed(range(len(f.rings))):
                ring = f.rings[j]
                area = P.ring_area(ring)
                perimeter = P.ring_perimeter(ring)
                adj_area = calculate_adj_area(area, perimeter)
                if j == 0:
                    if self.flag_del_outer and adj_area < min_adj_area:
                        del self.features[i]
                        self.res.nbr_pol_del += 1
                        break
                else:
                    if self.flag_del_inner and adj_area < min_adj_area:
                        del f.rings[j]
                        self.res.nbr_hole_del += 1

    def _create_geoms(self):
        gid = 0
        for f in self.features:
            geoms = []
            for ring in f.rings:
                gid += 1
                geoms.append(_Geom(gid, f.kind, ring, self.eps))
            self.feature_geoms.append(geoms)
            self.geoms.extend(geoms)

    def _pre_reduction(self):
        """Duplicate-node removal (reference :1630-1634)."""
        for g in self.geoms:
            if g.original_kind != KIND_POINT and not g.is_simplest:
                g.coords = _remove_duplicate_nodes(g.coords, self.eps.zero_relative)
                g.invalidate()

    # -- segment store queries ------------------------------------------------

    def _grow(self, rect):
        e = self.eps.zero_relative * 100.
        return (rect[0] - e, rect[1] - e, rect[2] + e, rect[3] + e)

    def _build_bbox_index(self):
        g = len(self.geoms)
        self._bbox_arr = np.empty((g, 4), dtype=np.float64)
        self._kind_arr = np.empty(g, dtype=np.int8)
        self._gid_row = {}
        for i, geom in enumerate(self.geoms):
            self._bbox_arr[i] = geom.bbox()
            self._kind_arr[i] = geom.original_kind
            self._gid_row[geom.gid] = i

    def _touch_geom(self, geom: _Geom):
        geom.invalidate()
        if self._bbox_arr is not None:
            self._bbox_arr[self._gid_row[geom.gid]] = geom.bbox()

    def _self_segments(self, geom: _Geom, rect, old_subline: np.ndarray,
                       excl_lo: int, excl_hi: int, sl_bbox=None) -> list:
        """Own segments whose bbox intersects rect, excluding those
        within the old subline (reference :506-534; index range
        [excl_lo, excl_hi) plus exact geometric containment).
        Returns a list of (x0,y0,x1,y1) Python-float tuples — the
        constraint predicates run on interpreter floats (candidate sets
        are tiny; numpy dispatch costs more than the arithmetic)."""
        bb = geom.seg_bbox()
        mask = (bb[:, 0] <= rect[2]) & (bb[:, 2] >= rect[0]) & \
               (bb[:, 1] <= rect[3]) & (bb[:, 3] >= rect[1])
        if excl_hi > excl_lo:
            mask[excl_lo:excl_hi] = False
        idx = np.flatnonzero(mask)
        if len(idx) == 0:
            return []
        xs, ys = geom.coord_lists()
        # bbox of the old subline: a segment not inside it cannot be
        # `within` the subline — skips the exact containment test
        if sl_bbox is None:
            sl_bbox = (old_subline[:, 0].min(), old_subline[:, 1].min(),
                       old_subline[:, 0].max(), old_subline[:, 1].max())
        sx0, sy0, sx1, sy1 = sl_bbox
        out = []
        for k in idx.tolist():
            x0, y0, x1, y1 = xs[k], ys[k], xs[k + 1], ys[k + 1]
            if (sx0 <= x0 <= sx1 and sy0 <= y0 <= sy1
                    and sx0 <= x1 <= sx1 and sy0 <= y1 <= sy1
                    and self._segment_within_polyline(x0, y0, x1, y1, old_subline)):
                continue
            out.append((x0, y0, x1, y1))
        return out

    @staticmethod
    def _segment_within_polyline(x0, y0, x1, y1, line: np.ndarray) -> bool:
        mx = 0.5 * (x0 + x1)
        my = 0.5 * (y0 + y1)
        return (P.point_on_polyline(x0, y0, line)
                and P.point_on_polyline(x1, y1, line)
                and P.point_on_polyline(mx, my, line))

    def _other_geoms_in_rect(self, geom: _Geom, rect):
        """(segment float-tuple list, point float-tuple list) of all
        OTHER live geometries intersecting rect (reference :506-534
        splits the same way)."""
        segs, pts = [], []
        if self._bbox_arr is None:
            self._build_bbox_index()
        bb_all = self._bbox_arr
        hit = ((bb_all[:, 0] <= rect[2]) & (bb_all[:, 2] >= rect[0])
               & (bb_all[:, 1] <= rect[3]) & (bb_all[:, 3] >= rect[1]))
        self_row = self._gid_row[geom.gid]
        hit[self_row] = False
        for row in np.flatnonzero(hit):
            g = self.geoms[row]
            if g.original_kind == KIND_POINT:
                x, y = g.coords[0, 0], g.coords[0, 1]
                if rect[0] <= x <= rect[2] and rect[1] <= y <= rect[3]:
                    pts.append((float(x), float(y)))
                continue
            bb = g.seg_bbox()
            mask = (bb[:, 0] <= rect[2]) & (bb[:, 2] >= rect[0]) & \
                   (bb[:, 1] <= rect[3]) & (bb[:, 3] >= rect[1])
            if mask.any():
                xs, ys = g.coord_lists()
                segs.extend((xs[k], ys[k], xs[k + 1], ys[k + 1])
                            for k in np.flatnonzero(mask).tolist())
        return segs, pts

    # -- vertex mutation -------------------------------------------------------

    def _delete_vertices(self, geom: _Geom, v_start: int, v_end: int):
        """Reference RbCollection.delete_vertex (:571-615) minus the
        index bookkeeping (tile-local arrays are authoritative)."""
        c = geom.coords
        closed = P.is_closed(c)
        if closed and v_start == 0:
            # circular-array case: drop leading verts (incl. the stale
            # duplicate closing vertex), re-close on the new first
            # vertex (reference :606-613)
            tail = c[v_end + 1:]
            geom.coords = np.concatenate((tail[:-1], tail[:1]))
        else:
            geom.coords = np.concatenate((c[:v_start], c[v_end + 1:]))
        self._touch_geom(geom)

    # -- co-linear deletion ------------------------------------------------------

    def _delete_co_linear(self, geom: _Geom):
        """Reference :1713-1752.  Returns the full vertex-angle array
        when the geometry was NOT mutated, so _detect_bends can reuse
        it instead of recomputing (most passes delete nothing)."""
        eps = self.eps
        coords = geom.coords
        closed = P.is_closed(coords)
        angles_full = P.vertex_angles(coords, closed)
        angles = angles_full
        if closed and len(angles) >= 1:
            angles = angles[1:]
        to_del = [i + 1 for i, a in enumerate(angles)
                  if abs(a - math.pi) <= eps.zero_angle or abs(a) <= eps.zero_angle]
        for vid in reversed(to_del):
            self._delete_vertices(geom, vid, vid)
        mutated = bool(to_del)
        if P.is_closed(geom.coords):
            n = len(geom.coords)
            if n >= 5:
                c = geom.coords
                tri = np.vstack([c[n - 2], c[0], c[1]])
                a = P.vertex_angles(tri, False)
                if len(a) and (abs(a[0] - math.pi) <= eps.zero_angle or abs(a[0]) <= eps.zero_angle):
                    self._delete_vertices(geom, 0, 0)
                    mutated = True
        # unchanged coords => unchanged length: the check only needs to
        # rerun after a mutation (same decision, computed once)
        if mutated or not geom.length_checked:
            geom.length_checked = True
            if P.polyline_length(geom.coords) <= eps.zero_relative:
                geom.is_simplest = True
        return None if mutated else angles_full

    # -- detection / pivot / flagging -----------------------------------------------

    def _detect_bends(self, geom: _Geom, angles=None) -> int:
        """Reference :1334-1384.  ``angles`` may carry the angle array
        _delete_co_linear already computed for the identical coords."""
        geom.bends = []
        coords = geom.coords
        closed = P.is_closed(coords)
        if angles is None:
            angles = P.vertex_angles(coords, closed)
        orientation = [CLOCK_WISE if a >= math.pi else ANTI_CLOCK_WISE for a in angles]
        if closed:
            if len(set(orientation)) == 1:
                orientation = []
            else:
                del orientation[0]
        if len(orientation) >= 1:
            orientation.insert(0, ANTI_CLOCK_WISE if orientation[0] == CLOCK_WISE else CLOCK_WISE)
            orientation.append(ANTI_CLOCK_WISE if orientation[-1] == CLOCK_WISE else CLOCK_WISE)
        inflexion = [i for i in range(len(orientation) - 1) if orientation[i] != orientation[i + 1]]
        if inflexion:
            xs, ys = geom.coord_lists()
            for k in range(len(inflexion) - 1):
                i = inflexion[k]
                j = inflexion[k + 1] + 1
                # pts is a VIEW (mutations always replace the coords
                # array, never write in place — view stays valid)
                geom.bends.append(_Bend(i, j, coords[i:j + 1], xs, ys))
        else:
            geom.is_simplest = True
        return len(geom.bends)

    def _pivot_closed_line(self, geom: _Geom):
        """Reference :1299-1332."""
        if not geom.need_pivot:
            return
        bend_location = None
        bend_area = 0.0
        min_adj = calculate_min_adj_area(self.diameter_tol)
        for bend in geom.bends:
            if bend.area > bend_area:
                bend_location = bend
                bend_area = bend.area
            if bend.j - bend.i >= 4 and bend.area >= min_adj:
                bend_location = bend
                geom.need_pivot = False
                break
        if bend_location is not None:
            pts = geom.coords
            k = (bend_location.j + bend_location.i) // 2
            geom.coords = np.vstack([pts[k:], pts[1:k + 1]])
            self._touch_geom(geom)

    def _flag_bend_to_reduce(self, geom: _Geom):
        """Reference :1219-1273."""
        min_adj_area = calculate_min_adj_area(self.diameter_tol)
        if P.is_closed(geom.coords) and len(geom.bends) >= 3:
            del geom.bends[0]
            del geom.bends[-1]
        lst = [(b.adj_area, i) for i, b in enumerate(geom.bends) if b.area < min_adj_area]
        lst.sort(key=lambda t: t[0])
        start, end = 0, len(geom.bends) - 1
        for adj_area, i in lst:
            if adj_area <= min_adj_area:
                if len(lst) == 1:
                    geom.bends[i].to_reduce = True
                else:
                    if i == start:
                        if not geom.bends[i + 1].to_reduce:
                            geom.bends[i].to_reduce = True
                    elif i == end:
                        if not geom.bends[i - 1].to_reduce:
                            geom.bends[i].to_reduce = True
                    elif geom.bends[i - 1].to_reduce or geom.bends[i + 1].to_reduce:
                        pass
                    else:
                        geom.bends[i].to_reduce = True
            else:
                break
        if len(geom.bends) == 0:
            geom.is_simplest = True

    # -- constraints ------------------------------------------------------------

    @staticmethod
    def _chord_simplicity_ok(ax0, ay0, ax1, ay1, self_segs: list) -> bool:
        for x0, y0, x1, y1 in self_segs:
            if R.chord_violated_f(ax0, ay0, ax1, ay1, x0, y0, x1, y1):
                return False
        return True

    @staticmethod
    def _chord_intersection_ok(ax0, ay0, ax1, ay1, other_segs: list,
                               other_pts: list) -> bool:
        for x0, y0, x1, y1 in other_segs:
            if R.chord_intersects_f(ax0, ay0, ax1, ay1, x0, y0, x1, y1):
                return False
        for px, py in other_pts:
            if R.chord_touches_point_f(ax0, ay0, ax1, ay1, px, py):
                return False
        return True

    def _validate_simplicity(self, self_segs: list, new_subline) -> bool:
        if len(new_subline) == 2:  # chord case: interpreter-float loop
            return self._chord_simplicity_ok(
                float(new_subline[0, 0]), float(new_subline[0, 1]),
                float(new_subline[1, 0]), float(new_subline[1, 1]), self_segs)
        for s in self_segs:  # smooth 4-point line (rare)
            if R.simplicity_violated(new_subline,
                                     np.array([[s[0], s[1]], [s[2], s[3]]])):
                return False
        return True

    @staticmethod
    def _validate_intersection(other_segs: list, other_pts: list,
                               new_subline) -> bool:
        if len(new_subline) == 2:  # chord case: interpreter-float loop
            return ReduceBend._chord_intersection_ok(
                float(new_subline[0, 0]), float(new_subline[0, 1]),
                float(new_subline[1, 0]), float(new_subline[1, 1]),
                other_segs, other_pts)
        for s in other_segs:
            if not R.disjoint_line_segment(new_subline,
                                           np.array([[s[0], s[1]], [s[2], s[3]]])):
                return False
        for pt in other_pts:
            if not R.disjoint_line_point(new_subline, pt):
                return False
        return True

    @staticmethod
    def _validate_sidedness(other_segs: list, other_pts: list, bend_ring) -> bool:
        for s in other_segs:
            if R.ring_contains_segment(bend_ring,
                                       np.array([[s[0], s[1]], [s[2], s[3]]])):
                return False
        for pt in other_pts:
            if R.ring_contains_point(bend_ring, pt):
                return False
        return True

    def _find_alternate_bends(self, geom: _Geom, ind: int) -> list:
        """Reference :1467-1498."""
        bend = geom.bends[ind]
        alternates = []
        j = bend.j
        pts = geom.coords
        xs, ys = geom.coord_lists()
        while j - 1 >= 2:
            i = bend.i
            while j - i >= 2:
                ab = _Bend(i, j, pts[i:j + 1], xs, ys)
                alternates.append(ab)
                i += 1
            j -= 1
        alternates.sort(key=lambda b: b.area, reverse=True)
        return alternates

    def _validate_alternate_bend(self, geom: _Geom, alternates, ind) -> bool:
        """Reference :1754-1791 (simplicity-only check per alternate)."""
        for alt in alternates:
            bb = alt.bbox_f()
            rect = self._grow(bb)
            self_segs = self._self_segments(geom, rect, alt.old_subline,
                                            alt.i, alt.j, bb)
            cx0, cy0, cx1, cy1 = alt.chord_f()
            if self._chord_simplicity_ok(cx0, cy0, cx1, cy1, self_segs):
                geom.bends[ind] = alt
                return True
        return False

    def _validate_constraints(self, geom: _Geom, ind: int) -> bool:
        """Reference :1793-1847 — including keeping the ORIGINAL bend's
        subline/polygon for checks 2 and 3 after an alternate swap."""
        constraints_valid = True
        bend = geom.bends[ind]
        bb = bend.bbox_f()
        rect = self._grow(bb)
        self_segs = self._self_segments(geom, rect, bend.old_subline,
                                        bend.i, bend.j, bb)
        other_segs, other_pts = self._other_geoms_in_rect(geom, rect)

        ax0, ay0, ax1, ay1 = bend.chord_f()
        # 2-point length via the same sqrt(dx*dx+dy*dy) float ops,
        # without the array machinery
        _dx = ax1 - ax0
        _dy = ay1 - ay0
        if math.sqrt(_dx * _dx + _dy * _dy) >= self.eps.zero_relative:
            constraints_valid = self._chord_simplicity_ok(ax0, ay0, ax1, ay1, self_segs)
            if not constraints_valid:
                alternates = self._find_alternate_bends(geom, ind)
                constraints_valid = self._validate_alternate_bend(geom, alternates, ind)
        # else: degenerate zero-length base — reference only logs (:1830-1836)

        if constraints_valid:
            # the ORIGINAL bend's chord: checks 2 and 3 keep the original
            # subline/polygon even after an alternate swap (reference)
            constraints_valid = self._chord_intersection_ok(
                ax0, ay0, ax1, ay1, other_segs, other_pts)
        if constraints_valid:
            constraints_valid = self._validate_sidedness(other_segs, other_pts, bend.pts)
        return constraints_valid

    # -- reduction loop -------------------------------------------------------------

    def _process_bends(self, geom: _Geom) -> int:
        """Reference :1893-1916."""
        nbr = 0
        for ind in reversed(range(len(geom.bends))):
            if geom.bends[ind].to_reduce:
                if self._validate_constraints(geom, ind):
                    bend = geom.bends[ind]
                    if self.smooth_line:
                        self.bends_reduced.append(_BendReduced(
                            geom, geom.coords[bend.i].copy(), geom.coords[bend.j].copy(),
                            bend.pts.copy()))
                    self._delete_vertices(geom, bend.i + 1, bend.j - 1)
                    nbr += 1
        return nbr

    def _manage_reduce_bend(self):
        """Reference :1664-1699."""
        min_nbr_pass = 2
        while True:
            nbr_bend_reduced = 0
            nbr_bend_detected = 0
            for geom in self.geoms:
                if not geom.is_simplest:
                    angles = self._delete_co_linear(geom)
                    nbr_bend_detected = self._detect_bends(geom, angles)
                    if geom.need_pivot:
                        self._pivot_closed_line(geom)
                        nbr_bend_detected = self._detect_bends(geom)
                    self._flag_bend_to_reduce(geom)
                    nbr_bend_reduced += self._process_bends(geom)
            self.res.nbr_bend_reduced.append(nbr_bend_reduced)
            self.res.nbr_bend_detected.append(nbr_bend_detected)
            if self.res.nbr_pass > min_nbr_pass and nbr_bend_reduced == 0:
                break
            self.res.nbr_pass += 1

    # -- smoothing --------------------------------------------------------------------

    @staticmethod
    def _calculate_smooth_angle(angle_i, angle_j, smooth_case):
        """Reference BendReduced._calculate_angle (:791-819)."""
        if angle_i > math.pi:
            angle_i = (2 * math.pi) - angle_i
        if angle_j > math.pi:
            angle_j = (2 * math.pi) - angle_j
        angle_smooth = max(angle_i, angle_j)
        angle_smooth = math.pi - angle_smooth
        if smooth_case == 1:
            angle_smooth /= 1.5
            if math.degrees(angle_smooth) > 30.:
                angle_smooth = math.radians(30.)
        else:  # cases 2 and 3
            if smooth_case == 2:
                angle_smooth /= 2.5
                if math.degrees(angle_smooth) > 20.:
                    angle_smooth = math.radians(20.)
            else:
                angle_smooth /= 3
                if math.degrees(angle_smooth) > 20.:
                    angle_smooth = math.radians(20.)
        return angle_smooth

    def _calculate_smooth_line(self, br: _BendReduced):
        """Reference :900-976 — translate to bend.i, rotate onto x-axis,
        place 2 points at 1/3 and 2/3 of the base, rotate/translate back."""
        cx, cy = P.ring_centroid(br.bend_ring)
        g = br.geom.coords
        sub = np.vstack([g[br.i - 1], g[br.i], g[br.j], g[br.j + 1]])
        tx, ty = sub[1, 0], sub[1, 1]
        sub_t = sub - np.array([tx, ty])
        cen_t = np.array([[cx - tx, cy - ty]])

        x_axis_length = math.hypot(sub_t[2, 0] - sub_t[1, 0], sub_t[2, 1] - sub_t[1, 1])
        angle_x_axis = P.angle_between_three_points(
            x_axis_length, 0., sub_t[1, 0], sub_t[1, 1], sub_t[2, 0], sub_t[2, 1])
        angle_deg = math.degrees(float(angle_x_axis))
        sub_r = P.rotate_cw(sub_t, -angle_deg)
        cen_r = P.rotate_cw(cen_t, -angle_deg)

        base_length = sub_r[2, 0]
        p0_x = base_length * (1. / 3.)
        p1_x = base_length * (2. / 3.)

        if sub_r[0, 1] * sub_r[3, 1] > 0:
            if sub_r[0, 1] * cen_r[0, 1] < 0:
                smooth_case = 1
            else:
                smooth_case = 2
        else:
            smooth_case = 3

        angle_i = float(P.angle_between_three_points(
            sub_r[0, 0], sub_r[0, 1], sub_r[1, 0], sub_r[1, 1], sub_r[2, 0], sub_r[2, 1]))
        angle_j = float(P.angle_between_three_points(
            sub_r[1, 0], sub_r[1, 1], sub_r[2, 0], sub_r[2, 1], sub_r[3, 0], sub_r[3, 1]))
        angle_smooth = self._calculate_smooth_angle(angle_i, angle_j, smooth_case)

        p0_y = math.tan(angle_smooth) * p0_x
        if smooth_case in (1, 2):
            if sub_r[0, 1] > 0.:
                p0_y *= -1
            s0 = (p0_x, p0_y)
            s1 = (p1_x, p0_y)
        else:
            if sub_r[0, 1] > 0.:
                p0_y *= -1
            s0 = (p0_x, p0_y)
            p0_y *= -1
            s1 = (p1_x, p0_y)

        smooth = np.array([[sub_r[1, 0], sub_r[1, 1]], [s0[0], s0[1]],
                           [s1[0], s1[1]], [sub_r[2, 0], sub_r[2, 1]]])
        smooth = P.rotate_cw(smooth, angle_deg)
        smooth = smooth + np.array([tx, ty])
        br.smooth_line = smooth

    def _resolve_non_valid_polygon(self, br: _BendReduced):
        """Reference :844-879: close the smooth line; if the ring
        self-intersects, split into valid parts (the only geometry a
        4-point smooth line can produce is a bow-tie across the base);
        reject smoothing if a part is degenerate."""
        ring = np.vstack([br.smooth_line, br.smooth_line[:1]])
        # check ring simplicity: only non-adjacent segment pairs can cross
        sl = br.smooth_line
        closure = (sl[3], sl[0])
        mid = (sl[1], sl[2])
        cross = P.segment_intersection_point(closure[0], closure[1], mid[0], mid[1])
        crosses = cross is not None and not (
            (cross[0] == sl[0][0] and cross[1] == sl[0][1]) or
            (cross[0] == sl[3][0] and cross[1] == sl[3][1]))
        if not crosses:
            br.smooth_parts = [ring]
            return
        x = np.array(cross)
        part1 = np.vstack([sl[0], sl[1], x, sl[0]])
        part2 = np.vstack([x, sl[2], sl[3], x])
        parts = []
        for part in (part1, part2):
            if P.ring_area(part) > self.eps.zero_relative:
                parts.append(part)
            else:
                br.is_line_smoothable = False
                br.smooth_parts = []
                return
        br.smooth_parts = parts

    def _set_smooth_values(self, br: _BendReduced):
        """Reference set_values (:978-1006)."""
        base_len = math.hypot(br.pt_end[0] - br.pt_start[0], br.pt_end[1] - br.pt_start[1])
        if base_len > self.diameter_tol * (2. / 3.):
            br.i = self._extract_vertex_ind(br.geom, br.pt_start)
            br.j = self._extract_vertex_ind(br.geom, br.pt_end)
            if br.i is not None and br.j is not None:
                if br.i + 1 == br.j:
                    if br.i >= 1 and br.j <= len(br.geom.coords) - 2:
                        br.is_line_smoothable = True
                    else:
                        br.is_line_smoothable = False
                else:
                    br.is_line_smoothable = False
            else:
                br.is_line_smoothable = False
        if br.is_line_smoothable:
            self._calculate_smooth_line(br)
            self._resolve_non_valid_polygon(br)

    def _extract_vertex_ind(self, geom: _Geom, pt) -> int | None:
        """Reference :881-898 (closestVertex + distance gate)."""
        d2 = (geom.coords[:, 0] - pt[0]) ** 2 + (geom.coords[:, 1] - pt[1]) ** 2
        vid = int(np.argmin(d2))
        if math.sqrt(d2[vid]) < self.eps.zero_relative:
            return vid
        return None

    def _validate_constraints_smooth(self, br: _BendReduced) -> bool:
        """Reference :1849-1891."""
        if br.smooth_parts:
            allpts = np.vstack(br.smooth_parts)
        else:
            allpts = br.smooth_line
        rect = self._grow(P.bbox(allpts))
        old_subline = np.vstack([br.pt_start[None, :], br.pt_end[None, :]])
        self_segs = self._self_segments(br.geom, rect, old_subline, br.i, br.j)
        other_segs, other_pts = self._other_geoms_in_rect(br.geom, rect)

        if not self._validate_simplicity(self_segs, br.smooth_line):
            return False
        if not self._validate_intersection(other_segs, other_pts, br.smooth_line):
            return False
        for part in br.smooth_parts:
            if not self._validate_sidedness(other_segs, other_pts, part):
                return False
        return True

    def _manage_smooth_line(self):
        """Reference :1918-1937."""
        for br in self.bends_reduced:
            self._set_smooth_values(br)
            if br.is_line_smoothable:
                if self._validate_constraints_smooth(br):
                    g = br.geom
                    g.coords = np.vstack([g.coords[:br.i + 1],
                                          br.smooth_line[1:3],
                                          g.coords[br.j:]])
                    self._touch_geom(g)
                    self.res.nbr_line_smooth += 1

    # -- output ---------------------------------------------------------------------

    def _rebuild_features(self):
        out = []
        for f, geoms in zip(self.features, self.feature_geoms):
            out.append(Feature(f.kind, [g.coords for g in geoms], f.attrs))
        self.res.features = out


def reduce_bends(features, diameter_tol, smooth_line=False, flag_del_outer=False,
                 flag_del_inner=False, epsilon: Epsilon | None = None) -> ReduceBendResult:
    """Facade mirroring ReduceBend.reduce (reference :1164-1184)."""
    rb = ReduceBend(features, diameter_tol, smooth_line, flag_del_outer,
                    flag_del_inner, epsilon)
    return rb.reduce()
