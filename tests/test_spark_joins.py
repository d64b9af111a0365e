"""G5.2/G5.3 — PIP join and kNN against brute-force NumPy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_sim_processing_a_spark.geom import primitives as P
from geo_sim_processing_a_spark.operators.spark_joins import knn_join, pip_join


def make_points(spark, n=2000, lo=-3.0, hi=3.0, seed=42):
    rng = np.random.RandomState(seed)
    lon = rng.uniform(lo, hi, n)
    lat = rng.uniform(lo, hi, n)
    pdf = [(int(i), float(lon[i]), float(lat[i])) for i in range(n)]
    return (spark.createDataFrame(pdf, "pid long, lon double, lat double"),
            lon, lat)


def make_polys(spark, m=40, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    rings = {}
    for j in range(m):
        cx, cy = rng.uniform(-2.5, 2.5, 2)
        w, h = rng.uniform(0.1, 0.9, 2)
        ang = rng.uniform(0, np.pi)
        # rotated rectangle => generic PIP, not just range predicates
        base = np.array([(-w, -h), (w, -h), (w, h), (-w, h), (-w, -h)])
        rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        ring = base @ rot.T + np.array([cx, cy])
        rings[j] = ring
        rows.append((int(j), ring[:, 0].tolist(), ring[:, 1].tolist()))
    return (spark.createDataFrame(rows, "poly_id long, xs array<double>, ys array<double>"),
            rings)


def test_pip_join_matches_bruteforce(spark):
    pts, lon, lat = make_points(spark)
    polys, rings = make_polys(spark)
    got = {(r["pid"], r["poly_id"]) for r in pip_join(pts, polys, res=8).collect()}
    exp = set()
    for j, ring in rings.items():
        inside = P.points_in_ring(lon, lat, ring)
        for i in np.flatnonzero(inside):
            exp.add((int(i), j))
    assert got == exp
    assert len(exp) > 100  # non-trivial fixture


def test_knn_matches_bruteforce(spark):
    # points confined to one res-4 cell's span so cell+ring1 covers all
    pts, lon, lat = make_points(spark, n=800, lo=0.1, hi=5.0, seed=3)
    for k in (1, 5):
        got = {}
        for r in knn_join(pts, k=k, res=4).collect():
            got.setdefault(r["pid"], []).append((r["rank"], r["neighbor_id"]))
        d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
        np.fill_diagonal(d2, np.inf)
        ids = np.arange(len(lon))
        for i in range(len(lon)):
            order = np.lexsort((ids, d2[i]))[:k]
            exp = [(r + 1, int(order[r])) for r in range(k)]
            assert sorted(got[i]) == exp, f"pid {i} k {k}"


def test_range_join_edges_and_dedup(spark):
    """Range join: closed-interval edge/corner touches count as
    overlap; a geometry spanning many cells yields exactly ONE row per
    pair (reference-point dedup, no distinct)."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.spark_joins import range_join

    def box(i, x0, y0, x1, y1):
        return (i, [x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0])

    def frame(rows, idc):
        pdf = pd.DataFrame(rows, columns=[idc, "xs", "ys"])
        return spark.createDataFrame(
            pdf, f"{idc} long, xs array<double>, ys array<double>")

    a = frame([box(1, 0.0, 0.0, 1.0, 1.0),
               box(2, 50.0, 50.0, 51.0, 51.0),
               box(3, -20.0, -20.0, 20.0, 20.0)], "a_id")
    b = frame([box(10, 1.0, 0.0, 2.0, 1.0),     # shares the x=1 edge with 1
               box(11, 1.0, 1.0, 2.0, 2.0),     # touches 1 at corner (1,1)
               box(12, 30.0, 30.0, 31.0, 31.0),  # disjoint from everything
               box(13, -5.0, -5.0, 5.0, 5.0)], "b_id")
    got = sorted((r["a_id"], r["b_id"]) for r in range_join(a, b, res=6).collect())
    assert got == [(1, 10), (1, 11), (1, 13), (3, 10), (3, 11), (3, 13)]
