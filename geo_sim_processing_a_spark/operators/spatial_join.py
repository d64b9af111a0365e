"""Tile-local spatial-join kernels (SURVEY.md §2.4 X8-X10).

These run inside ``applyInPandas`` after the coarse cell-equi-join has
co-located candidates (the classic filter-refine spatial join): the
cell join is a Catalyst hash join; the exact refine below is
vectorized NumPy.
"""

from __future__ import annotations

import numpy as np

from ..geom import primitives as P


def pip_refine(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Exact point-in-polygon refine for one polygon over candidate
    points (strict crossing-number parity; boundary-free data by
    construction in the pipeline)."""
    return P.points_in_ring(np.asarray(px, float), np.asarray(py, float), ring)


def knn_brute(qx: np.ndarray, qy: np.ndarray, px: np.ndarray, py: np.ndarray,
              pid: np.ndarray, k: int, exclude_same_index: bool = False):
    """Exact k-nearest-neighbors of query points among candidate points.
    Ties broken by (distance^2, pid) ascending — deterministic.

    Returns (idx, dist2): each (nq, k) arrays of candidate positions and
    squared distances.  Candidate count < k returns fewer columns.
    """
    qx = np.asarray(qx, float)[:, None]
    qy = np.asarray(qy, float)[:, None]
    dx = qx - np.asarray(px, float)[None, :]
    dy = qy - np.asarray(py, float)[None, :]
    d2 = dx * dx + dy * dy
    if exclude_same_index:
        nq = d2.shape[0]
        d2[np.arange(nq), np.arange(nq)] = np.inf
    kk = min(k, d2.shape[1])
    # lexicographic (d2, pid) ordering for deterministic ties
    order = np.lexsort((np.broadcast_to(pid, d2.shape), d2), axis=1)[:, :kk]
    rows = np.arange(d2.shape[0])[:, None]
    return order, d2[rows, order]
