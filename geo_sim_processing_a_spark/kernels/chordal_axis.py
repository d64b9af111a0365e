"""Chordal-axis skeleton extraction — from-scratch NumPy/graph kernel.

Replicates the decision logic of /root/reference/chordal_axis_algorithm.py
(Prasad 2005 rectification) over triangles produced by our own
tessellator (tessellate.py):

 - triangle typing by live-neighbor count            :1209-1244
 - centre-line emission per type                     :1331-1418
 - degree-2 line merging (GEOS mergeLines semantics) :249-278
 - iterative junction pruning w/ width tolerance     :1065-1148, :856-870
 - T-junction correction (adjacency special case +
   45-degree straight-pair rule)                     :932-976
 - X-junction correction (merge junctions closer
   than 0.2*min(width))                              :978-1063, :883-926

Divergences (documented):
 - adjacency is an exact shared-edge hash join instead of an R-tree
   midpoint probe (identical result on any valid tessellation,
   SURVEY.md §2.4 X5);
 - the buffered `crosses` test of validate_x_junction (:1046-1051) is
   replaced by a sampled distance test with the same 0.01 inflation;
 - a merged X junction that keeps != 4 boundary midpoints is rejected
   (the reference would raise IndexError at :1058-1061).
"""

from __future__ import annotations

import math

import numpy as np

from ..geom import primitives as P

ISOLATED = 0
TERMINAL = 1
SLEEVE = 2
SLEEVE_X = 3
JUNCTION = 4
JUNCTION_T = 5
JUNCTION_X_FIRST = 6
JUNCTION_X_LAST = 7
JUNCTION_X_LENGTH = .2
ANGLE_JUNCTION_T = 45.
ZERO = 0.000001


def difference_angle_vector(p0, p1, zero_tolerance) -> float:
    """GenUtil.difference_angle_vector (:281-322) — atan with manual
    quadrant correction and a delta_x clamp; angle in [0..360]."""
    x0, y0 = p0[0], p0[1]
    x1, y1 = p1[0], p1[1]
    delta_y = y1 - y0
    delta_x = x1 - x0
    if abs(delta_x) <= zero_tolerance:
        delta_x = zero_tolerance
    angle = math.degrees(math.atan(delta_y / delta_x))
    if delta_x >= 0 and delta_y >= 0:
        pass
    elif delta_x < 0 and delta_y >= 0:
        angle += 180.
    elif delta_x < 0 and delta_y < 0:
        angle += 180.
    else:
        angle += 360.
    return angle


def merge_lines(lines: list) -> list:
    """GEOS LineMerger semantics: repeatedly join polylines at endpoints
    of degree 2.  Deterministic: processes lines in input order."""
    lines = [np.asarray(l, dtype=np.float64) for l in lines]
    if not lines:
        return []

    def key(pt):
        return (float(pt[0]), float(pt[1]))

    # endpoint degree count
    deg: dict = {}
    for l in lines:
        for pt in (l[0], l[-1]):
            deg[key(pt)] = deg.get(key(pt), 0) + 1

    unused = list(range(len(lines)))
    endpoints: dict = {}
    for i in unused:
        for pt in (lines[i][0], lines[i][-1]):
            endpoints.setdefault(key(pt), []).append(i)

    used = [False] * len(lines)
    out = []
    for i in range(len(lines)):
        if used[i]:
            continue
        used[i] = True
        chain = lines[i]
        # extend forward and backward while the junction degree is 2
        grew = True
        while grew:
            grew = False
            for end, at_start in ((key(chain[-1]), False), (key(chain[0]), True)):
                if deg.get(end, 0) != 2:
                    continue
                nxt = None
                for j in endpoints.get(end, []):
                    if not used[j]:
                        nxt = j
                        break
                if nxt is None:
                    continue
                used[nxt] = True
                seg = lines[nxt]
                if key(seg[0]) != end:
                    seg = seg[::-1]
                if at_start:
                    chain = np.vstack([seg[::-1], chain[1:]])
                else:
                    chain = np.vstack([chain, seg[1:]])
                grew = True
        out.append(chain)
    return out


class Triangle:
    """Reference _TriangleSc (:1151-1435) with lazy cached attributes."""

    __slots__ = ("tid", "pts", "alive", "engine", "junction_side_a", "junction_side_b",
                 "junction_x_mid_pnt_sides", "junction_x_centroid",
                 "_mid_pnt_sides", "_type", "_adjacent", "_width", "_centre_line")

    def __init__(self, tid: int, pts: np.ndarray, engine):
        self.tid = tid
        self.pts = np.asarray(pts, dtype=np.float64)[:3]
        self.alive = True
        self.engine = engine
        self.junction_side_a = None
        self.junction_side_b = None
        self.junction_x_mid_pnt_sides = None
        self.junction_x_centroid = None
        self.reset_attributes()

    def reset_attributes(self):
        self._mid_pnt_sides = None
        self._type = None
        self._adjacent = None
        self._width = None
        self._centre_line = None

    # -- lazy attributes ----------------------------------------------------

    @property
    def mid_pnt_sides(self):
        if self._mid_pnt_sides is None:
            if self.junction_x_mid_pnt_sides is None:
                p = self.pts
                self._mid_pnt_sides = [
                    0.5 * (p[0] + p[1]), 0.5 * (p[1] + p[2]), 0.5 * (p[2] + p[0])]
            else:
                self._mid_pnt_sides = self.junction_x_mid_pnt_sides
        return self._mid_pnt_sides

    @property
    def adjacent(self):
        if self._adjacent is None:
            self._adjacent = self.engine.adjacent_of(self)
        return self._adjacent

    @property
    def type(self):
        if self._type is None:
            nbr = sum(1 for a in self.adjacent if a is not None)
            if nbr == 0:
                self._type = ISOLATED
            elif nbr == 1:
                self._type = TERMINAL
            elif nbr == 2:
                self._type = SLEEVE
            else:
                self._type = JUNCTION_T if self.junction_side_a is not None else JUNCTION
        return self._type

    @type.setter
    def type(self, value):
        self._type = value
        if value in (JUNCTION_X_FIRST, JUNCTION_X_LAST, SLEEVE_X):
            self._centre_line = None

    @property
    def width(self):
        if self._width is None:
            self._width = 2. * max(P.polyline_length(l) for l in self.centre_line)
        return self._width

    @property
    def centre_line(self):
        if self._centre_line is None:
            lines = []
            t = self.type
            p = self.pts
            mids = self.mid_pnt_sides
            if t == ISOLATED or t == SLEEVE_X or t == JUNCTION_X_LAST:
                pass
            elif t == TERMINAL:
                adj = self.adjacent
                coords = None
                if adj[0] is not None:
                    coords = np.vstack([p[2], mids[0]])
                if adj[1] is not None:
                    coords = np.vstack([p[0], mids[1]])
                if adj[2] is not None:
                    coords = np.vstack([p[1], mids[2]])
                lines.append(coords)
            elif t == SLEEVE:
                mp = [mids[i] for i, a in enumerate(self.adjacent) if a is not None]
                lines.append(np.vstack([mp[0], mp[1]]))
            elif t == JUNCTION:
                # reference computes (x0+x1+x2)/3. exactly (:1382-1384)
                centroid = np.array([(p[0, 0] + p[1, 0] + p[2, 0]) / 3.,
                                     (p[0, 1] + p[1, 1] + p[2, 1]) / 3.])
                for m in mids:
                    lines.append(np.vstack([centroid, m]))
            elif t == JUNCTION_T:
                p0 = mids[self.junction_side_a]
                p1 = mids[self.junction_side_b]
                centroid = 0.5 * (p0 + p1)
                for m in mids:
                    lines.append(np.vstack([centroid, m]))
            elif t == JUNCTION_X_FIRST:
                for m in self.junction_x_mid_pnt_sides:
                    lines.append(np.vstack([self.junction_x_centroid, m]))
            self._centre_line = lines
        return self._centre_line


class Branch:
    """Reference Branch (:1438-1538)."""

    def __init__(self, engine, current_triangle: Triangle, next_triangle: Triangle):
        self.engine = engine
        self.current_triangle = current_triangle
        self.triangle_in_branch = []
        self.length = 0.
        max_length = current_triangle.width * 3.
        visited = {current_triangle.tid}
        while True:
            if next_triangle.tid in visited and \
                    next_triangle.type in (SLEEVE, TERMINAL):
                # cycle guard: a pure-sleeve ring around a hole (bridge
                # edges can give zero-length centre lines, defeating the
                # max_length stop) would walk forever.  A revisited
                # JUNCTION still takes the normal append-then-break path
                # below, matching the reference's walk (:1460-1469).
                break
            visited.add(next_triangle.tid)
            self.triangle_in_branch.append(next_triangle)
            if next_triangle.type in (SLEEVE, TERMINAL):
                self.length += P.polyline_length(next_triangle.centre_line[0])
                if next_triangle.type == TERMINAL:
                    break
            else:
                break
            if self.length < max_length:
                adjacents = [a for a in next_triangle.adjacent if a is not None]
                if adjacents[0].tid == current_triangle.tid:
                    current_triangle, next_triangle = next_triangle, adjacents[1]
                else:
                    current_triangle, next_triangle = next_triangle, adjacents[0]
            else:
                break
        self.last_triangle_type = self.triangle_in_branch[-1].type
        self._angle = None

    @property
    def angle(self):
        if self._angle is None:
            lines = []
            for t in self.triangle_in_branch:
                if t.type in (SLEEVE, TERMINAL):
                    lines += t.centre_line
            merged = merge_lines(lines)
            line = merged[0]
            x0, y0 = float(line[0, 0]), float(line[0, 1])
            x1, y1 = float(line[-1, 0]), float(line[-1, 1])
            tri = np.vstack([self.current_triangle.pts, self.current_triangle.pts[:1]])
            if P.point_polyline_dist(x0, y0, tri) < self.engine.search_tolerance:
                pass
            else:
                x0, y0, x1, y1 = x1, y1, x0, y0
            self._angle = difference_angle_vector((x0, y0), (x1, y1), self.engine.search_tolerance)
        return self._angle


class _Holder:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class ChordalAxis:
    """Reference ChordalAxis (:487-1148) over one polygon's triangles."""

    def __init__(self, triangles: list, search_tolerance: float = ZERO):
        self.search_tolerance = search_tolerance
        self.triangles = [Triangle(i, t, self) for i, t in enumerate(triangles)]
        self._edge_map = None
        self.cluster = list(self.triangles)
        self.nbr_polygons = 1
        self.nbr_triangles = len(self.triangles)
        self.nbr_lines_pruned = 0
        self.nbr_iteration = 0
        self.nbr_t_junction = 0
        self.nbr_x_junction = 0

    # -- adjacency (exact shared-edge hash join; invariant under the
    #    reference's midpoint R-tree probe on valid tessellations) -----------

    def _edges(self):
        if self._edge_map is None:
            em: dict = {}
            for t in self.triangles:
                p = t.pts
                for k in range(3):
                    a = (float(p[k][0]), float(p[k][1]))
                    b = (float(p[(k + 1) % 3][0]), float(p[(k + 1) % 3][1]))
                    e = (min(a, b), max(a, b))
                    em.setdefault(e, []).append(t)
            self._edge_map = em
        return self._edge_map

    def adjacent_of(self, tri: Triangle):
        em = self._edges()
        p = tri.pts
        out = []
        for k in range(3):
            a = (float(p[k][0]), float(p[k][1]))
            b = (float(p[(k + 1) % 3][0]), float(p[(k + 1) % 3][1]))
            e = (min(a, b), max(a, b))
            other = None
            for t in em.get(e, []):
                if t.tid != tri.tid and t.alive:
                    other = t
                    break
            out.append(other)
        return out

    # -- skeleton --------------------------------------------------------------

    def get_skeleton(self) -> list:
        centre_lines = []
        for t in self.cluster:
            centre_lines += t.centre_line
        return merge_lines(centre_lines)

    def correct_skeleton(self):
        """Reference :840-930 (prune → T → X, same iteration scheme)."""
        nbr_iteration = 0
        max_sweeps = len(self.cluster) + 2  # defensive cap (hole graphs)
        while True:
            nbr_pruned = 0
            nbr_iteration += 1
            if nbr_iteration > max_sweeps:
                break
            i = 0
            while i < len(self.cluster):  # Python-for-over-mutating-list
                t = self.cluster[i]
                if t.type == JUNCTION:
                    nbr_pruned += self.prune_junction(t)
                i += 1
            self.nbr_lines_pruned += nbr_pruned
            if nbr_pruned == 0:
                self.nbr_iteration = max(self.nbr_iteration, nbr_iteration)
                break

        for t in self.cluster:
            if t.type == JUNCTION:
                sides = self.adjust_t_junction(t)
                if sides is not None:
                    self.nbr_t_junction += 1
                    t.junction_side_a = sides[0]
                    t.junction_side_b = sides[1]
                    t.reset_attributes()

        total_infos = []
        for t in self.cluster:
            if t.type in (JUNCTION, JUNCTION_T):
                infos = self.adjust_x_junction(t)
                if len(infos) >= 1:
                    total_infos.append(infos)

        id_to_remove = []
        for infos in total_infos:
            if len(infos) >= 2:
                for x in infos:
                    id_to_remove += [x.first_junction.tid, x.last_junction.tid]
        for infos in total_infos:
            if len(infos) == 1:
                x = infos[0]
                fj, lj = x.first_junction, x.last_junction
                if fj.tid not in id_to_remove and lj.tid not in id_to_remove:
                    if fj.type in (JUNCTION, JUNCTION_T) and lj.type in (JUNCTION, JUNCTION_T):
                        self.nbr_x_junction += 1
                        fj.type = JUNCTION_X_FIRST
                        fj.junction_x_mid_pnt_sides = x.mid_pnt_sides
                        fj.junction_x_centroid = x.x_centroid
                        lj.type = JUNCTION_X_LAST
                        for s in x.sleeve_in_branch:
                            s.type = SLEEVE_X

    # -- corrections -------------------------------------------------------------

    def adjust_t_junction(self, junction: Triangle):
        """Reference :932-976."""
        sides_t = None
        for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
            adj = junction.adjacent
            if adj[i].type in (JUNCTION, JUNCTION_T) and adj[j].type == SLEEVE \
                    and adj[k].type == SLEEVE:
                sides_t = [j, k]
                break
        if sides_t is None:
            branches = []
            for nxt in junction.adjacent:
                if nxt.type == SLEEVE:
                    branches.append(Branch(self, junction, nxt))
            branch_angle = [b.angle for b in branches]
            if len(branches) == 3:
                angle_max = ANGLE_JUNCTION_T
                for i, j in [(0, 1), (1, 2), (2, 0)]:
                    delta = abs(180. - abs(branch_angle[i] - branch_angle[j]))
                    if delta < angle_max:
                        angle_max = delta
                        sides_t = [i, j]
        return sides_t

    def adjust_x_junction(self, current: Triangle):
        """Reference :978-1030."""
        infos = []
        for adj in current.adjacent:
            branch = Branch(self, current, adj)
            last = branch.triangle_in_branch[-1]
            if last.type in (JUNCTION, JUNCTION_T) and \
                    branch.length < min(current.width, last.width) * JUNCTION_X_LENGTH:
                triangles = [current] + branch.triangle_in_branch
                merged_ring = self._unary_union([t.pts for t in triangles])
                if merged_ring is None:
                    continue
                mids = list(current.mid_pnt_sides) + list(last.mid_pnt_sides)
                boundary = np.vstack([merged_ring, merged_ring[:1]])
                new_mids = [m for m in mids
                            if P.point_polyline_dist(m[0], m[1], boundary) < self.search_tolerance]
                cx, cy = P.ring_centroid(merged_ring)
                centroid = np.array([cx, cy])
                if self.validate_x_junction(merged_ring, centroid, new_mids):
                    infos.append(_Holder(first_junction=current, last_junction=last,
                                         sleeve_in_branch=branch.triangle_in_branch[:-1],
                                         mid_pnt_sides=new_mids, x_centroid=centroid))
        return infos

    def validate_x_junction(self, merged_ring, centroid, new_mids) -> bool:
        """Reference :1032-1063. Divergence: !=4 kept midpoints =>
        reject (reference raises IndexError in its dead angle loop)."""
        if len(new_mids) != 4:
            return False
        for m in new_mids:
            if self._line_crosses_inflated(centroid, m, merged_ring, 0.01):
                return False
        return True

    @staticmethod
    def _line_crosses_inflated(a, b, ring, inflate) -> bool:
        """Sampled stand-in for GEOS line.crosses(polygon.buffer(.01,3)):
        True iff part of segment a-b lies farther than `inflate` outside
        the polygon while another part is inside."""
        ts = np.linspace(0.0, 1.0, 65)
        px = a[0] + ts * (b[0] - a[0])
        py = a[1] + ts * (b[1] - a[1])
        boundary = np.vstack([ring, ring[:1]])
        any_inside = False
        any_far_outside = False
        for x, y in zip(px, py):
            side = P.point_in_ring(x, y, ring)
            if side >= 0:
                any_inside = True
            else:
                if P.point_polyline_dist(x, y, boundary) > inflate:
                    any_far_outside = True
        return any_inside and any_far_outside

    @staticmethod
    def _unary_union(tri_list) -> np.ndarray | None:
        """Union of edge-adjacent triangles via directed-edge
        cancellation; returns the open boundary ring or None if the
        union is not a single simple polygon."""
        edges = {}
        for pts in tri_list:
            p = np.asarray(pts)
            if P.signed_area(p) < 0:
                p = p[::-1]
            for k in range(3):
                a = (float(p[k][0]), float(p[k][1]))
                b = (float(p[(k + 1) % 3][0]), float(p[(k + 1) % 3][1]))
                if (b, a) in edges:
                    del edges[(b, a)]
                else:
                    edges[(a, b)] = True
        if not edges:
            return None
        nxt = {a: b for (a, b) in edges}
        if len(nxt) != len(edges):
            return None  # pinch point
        start = next(iter(nxt))
        ring = [start]
        cur = nxt[start]
        guard = 0
        while cur != start and guard <= len(nxt):
            ring.append(cur)
            cur = nxt.get(cur)
            guard += 1
            if cur is None:
                return None
        if cur != start or len(ring) != len(nxt):
            return None  # multiple loops => not a single polygon
        return np.array(ring, dtype=np.float64)

    # -- pruning ------------------------------------------------------------------

    def prune_junction(self, junction: Triangle) -> int:
        """Reference :1065-1148."""
        branches = []
        for nxt in junction.adjacent:
            branch = Branch(self, junction, nxt)
            if branch.last_triangle_type == TERMINAL and branch.length <= junction.width:
                branches.append(branch)

        if len(branches) == 3:
            max_length = float("inf")
            del_branches = []
            for b in branches:
                if b.length < max_length:
                    del_branches = [b]
                    max_length = b.length
        elif len(branches) == 2:
            if branches[0].length < branches[1].length:
                b0, b1 = branches[0], branches[1]
            else:
                b0, b1 = branches[1], branches[0]
            if b0.length < .3 * b1.length:
                del_branches = [b0]
            else:
                del_branches = [b0, b1]
        elif len(branches) == 1:
            del_branches = [branches[0]]
        else:
            del_branches = []

        if del_branches:
            to_reset = []
            to_isolate = []
            for b in del_branches:
                for t in b.triangle_in_branch:
                    for ref in t.adjacent:
                        if ref is not None:
                            to_reset.append(ref)
                    to_isolate.append(t)
            for t in to_reset:
                t.reset_attributes()
            for t in to_isolate:
                t.alive = False
            for t in to_isolate:
                for i, c in enumerate(self.cluster):
                    if t.tid == c.tid:
                        del self.cluster[i]
                        break
        return len(del_branches)


def chordal_axis_skeleton(rings: list, correction: bool = False,
                          search_tolerance: float = ZERO):
    """Tessellate a polygon and extract its (optionally corrected)
    chordal-axis skeleton. Returns (list of polylines, stats dict)."""
    from .tessellate import tessellate

    tris = tessellate(rings)
    ca = ChordalAxis(tris, search_tolerance)
    if correction:
        ca.correct_skeleton()
    lines = ca.get_skeleton()
    stats = {
        "nbr_triangles": ca.nbr_triangles,
        "nbr_lines_pruned": ca.nbr_lines_pruned,
        "nbr_t_junction": ca.nbr_t_junction,
        "nbr_x_junction": ca.nbr_x_junction,
    }
    return lines, stats
