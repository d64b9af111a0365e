"""Round-2 operator evidence: real rasterization (X10), skeleton
geometry through Spark + dual sink (S3), data-dependent epsilon in the
distributed pipeline (R1), multi-ring synthesis invariants."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_sim_processing_a_spark.geom.epsilon import Epsilon
from geo_sim_processing_a_spark.operators import cells as C
from geo_sim_processing_a_spark.operators.skeleton import (
    LAYER_SKELETON, LAYER_TRIANGLE, chordal_axis_frame, write_dual_sink)
from geo_sim_processing_a_spark.operators.tiling import raster_tile_assign


def _cell_frame(spark, geoms):
    """geoms: list of (url, kind, xs, ys, ring_offsets) in fractional
    coordinates of the res-6 cell containing (0.2, 0.2)."""
    cell = C.encode(np.array([0.2]), np.array([0.2]), 6)
    lo0, la0, lo1, la1 = C.cell_bounds(cell)
    lo0, la0 = float(lo0[0]), float(la0[0])
    w, h = float(lo1[0]) - lo0, float(la1[0]) - la0
    pdf = pd.DataFrame({
        "url": [g[0] for g in geoms],
        "kind": [g[1] for g in geoms],
        "xs": [[lo0 + f * w for f in g[2]] for g in geoms],
        "ys": [[la0 + f * h for f in g[3]] for g in geoms],
        "ring_offsets": [g[4] for g in geoms],
    })
    return spark.createDataFrame(
        pdf, "url string, kind tinyint, xs array<double>, "
             "ys array<double>, ring_offsets array<int>")


def test_raster_concave_differs_from_bbox_fill(spark):
    """An L-shaped polygon's occupancy must leave the concave notch
    empty — the bbox fill (the old behavior) would mark the full
    13x13 rectangle."""
    L = ("L", 2,
         [.1, .9, .9, .5, .5, .1, .1],
         [.1, .1, .5, .5, .9, .9, .1], [0])
    out = raster_tile_assign(_cell_frame(spark, [L]), res=6, sub_res=4).collect()
    own = [r for r in out if r["is_owner"]]
    assert len(own) == 1
    occ = np.array(own[0]["occupancy"]).reshape(16, 16)
    n_sub = 16
    # bbox of the L spans sub-cells 1..14 in both axes => bbox fill = 196
    bbox_fill = 14 * 14
    assert occ.sum() < bbox_fill
    # the notch: upper-right quadrant interior (e.g. fractional (.7,.7))
    assert not occ[11, 11]
    # the filled arm: lower strip (.5,.3) and left column (.3,.7)
    assert occ[4, 8]
    assert occ[11, 4]


def test_raster_hole_punched_out(spark):
    H = ("H", 2,
         [.1, .9, .9, .1, .1, .3, .3, .7, .7, .3],
         [.1, .1, .9, .9, .1, .3, .7, .7, .3, .3], [0, 5])
    out = raster_tile_assign(_cell_frame(spark, [H]), res=6, sub_res=4).collect()
    own = [r for r in out if r["is_owner"]][0]
    occ = np.array(own["occupancy"]).reshape(16, 16)
    # hole interior empty, ring solid
    assert not occ[8, 8]
    assert occ[2, 8]
    assert occ[8, 2]


def test_raster_line_traversal_exact(spark):
    """A diagonal line marks exactly the sub-cells it passes through
    (grid traversal), not its bbox."""
    D = ("D", 1, [.05, .95], [.05, .95], [0])
    out = raster_tile_assign(_cell_frame(spark, [D]), res=6, sub_res=4).collect()
    own = [r for r in out if r["is_owner"]][0]
    occ = np.array(own["occupancy"]).reshape(16, 16)
    # diagonal of a square grid touches ~2n-1 cells, never the corners
    assert 16 <= occ.sum() <= 31
    assert not occ[0, 15] and not occ[15, 0]
    assert occ[0, 0] and occ[15, 15]


def test_clip_rejects_outside_axis_parallel_segments():
    """Liang-Barsky degenerate axis: a dx==0 (or dy==0) segment whose
    shared coordinate lies OUTSIDE the window must be rejected, not
    clipped into the edge column/row (round-3 ADVICE fix)."""
    from geo_sim_processing_a_spark.operators.tiling import _clip_segments_to_grid

    # vertical segment at gx=20, entirely right of a 16-wide window
    keep, *_ = _clip_segments_to_grid(
        np.array([20.0]), np.array([2.0]), np.array([20.0]), np.array([10.0]), 16)
    assert not keep[0]
    # horizontal segment below the window
    keep, *_ = _clip_segments_to_grid(
        np.array([2.0]), np.array([-5.0]), np.array([10.0]), np.array([-5.0]), 16)
    assert not keep[0]
    # inside-window vertical segment is still kept and clipped on y
    keep, ax, ay, bx, by = _clip_segments_to_grid(
        np.array([3.0]), np.array([-5.0]), np.array([3.0]), np.array([20.0]), 16)
    assert keep[0] and ay[0] == 0.0 and by[0] == 16.0 and ax[0] == 3.0


def test_raster_outside_vertical_edge_marks_nothing(spark):
    """A line spanning 3 cells whose vertical edge lies in a FAR cell
    must not mark any sub-cells of the first cell's edge column (the
    pre-fix clip collapsed the outside vertical edge into column 15)."""
    cell = C.encode(np.array([0.2]), np.array([0.2]), 6)
    lo0, la0, lo1, la1 = C.cell_bounds(cell)
    lo0, la0 = float(lo0[0]), float(la0[0])
    w, h = float(lo1[0]) - lo0, float(la1[0]) - la0
    # horizontal run at fy=0.2 from fx=0.5 to fx=2.5, then vertical up
    # to fy=0.8 at fx=2.5 (two cells to the right of the owner cell)
    pdf = pd.DataFrame({
        "url": ["far"], "kind": [1],
        "xs": [[lo0 + 0.5 * w, lo0 + 2.5 * w, lo0 + 2.5 * w]],
        "ys": [[la0 + 0.2 * h, la0 + 0.2 * h, la0 + 0.8 * h]],
        "ring_offsets": [[0]],
    })
    df = spark.createDataFrame(
        pdf, "url string, kind tinyint, xs array<double>, "
             "ys array<double>, ring_offsets array<int>")
    out = raster_tile_assign(df, res=6, sub_res=4).collect()
    own = [r for r in out if int(r["cell"]) == int(cell[0])]
    assert len(own) == 1
    occ = np.array(own[0]["occupancy"]).reshape(16, 16)
    # the horizontal edge at gy=3.2 marks row 3, cols 8..15 — and ONLY that
    assert occ[3, 8:].all()
    occ[3, :] = False
    assert not occ.any(), "outside vertical edge leaked into this cell"


def test_skeleton_through_spark_matches_local_kernel(spark):
    """The distributed chordal-axis frame reproduces the local kernel's
    skeleton EXACTLY (same merged centre-line vertex sequences)."""
    from geo_sim_processing_a_spark.kernels.chordal_axis import chordal_axis_skeleton

    ring = np.array([(0., 0.), (10., 0.), (10., 2.), (0., 2.), (0., 0.)])
    lines, _ = chordal_axis_skeleton([ring], correction=True)

    pdf = pd.DataFrame({"url": ["p"], "xs": [ring[:, 0].tolist()],
                        "ys": [ring[:, 1].tolist()], "ring_offsets": [[0]]})
    df = spark.createDataFrame(
        pdf, "url string, xs array<double>, ys array<double>, ring_offsets array<int>")
    got = (chordal_axis_frame(df, correction=True)
           .where(F.col("layer") == LAYER_SKELETON)
           .orderBy("part_id").collect())
    assert len(got) == len(lines)
    for row, exp in zip(got, lines):
        assert np.array_equal(np.column_stack([row["xs"], row["ys"]]), exp)


def test_dual_sink_writes_both_layers(spark, tmp_path):
    """S3 — one kernel pass, two layers on disk (skeleton + triangles),
    holed polygon included (hole bridged into the tessellation)."""
    outer = [(0., 0.), (8., 0.), (8., 8.), (0., 8.), (0., 0.)]
    hole = [(3., 3.), (3., 5.), (5., 5.), (5., 3.), (3., 3.)]
    xs = [p[0] for p in outer] + [p[0] for p in hole]
    ys = [p[1] for p in outer] + [p[1] for p in hole]
    pdf = pd.DataFrame({"url": ["holed"], "xs": [xs], "ys": [ys],
                        "ring_offsets": [[0, 5]]})
    df = spark.createDataFrame(
        pdf, "url string, xs array<double>, ys array<double>, ring_offsets array<int>")
    sink = os.path.join(str(tmp_path), "dual")
    write_dual_sink(chordal_axis_frame(df, correction=True), sink)
    back = spark.read.parquet(sink)
    counts = {r["layer"]: r["n"] for r in
              back.groupBy("layer").agg(F.count("*").alias("n")).collect()}
    assert counts.get(LAYER_TRIANGLE, 0) >= 4
    assert counts.get(LAYER_SKELETON, 0) >= 1
    skel = back.where(F.col("layer") == LAYER_SKELETON).first()
    assert len(skel["xs"]) >= 2  # real coordinates, not stats


def test_pipeline_derives_reference_epsilon(spark, tmp_path):
    """R1 — run_pipeline(epsilon=None) on map-unit (non-lon/lat) data
    derives the reference's epsilon from the global bbox aggregate
    (reduce_bend_algorithm.py:1045-1088)."""
    from geo_sim_processing_a_spark.plans.pipeline import derive_epsilon

    pdf = pd.DataFrame({
        "url": ["a", "b"], "h": [1, 2], "kind": [1, 1],
        "xs": [[100000.0, 250000.0], [400000.0, 655000.0]],
        "ys": [[5000000.0, 5100000.0], [5200000.0, 5300000.0]],
        "ring_offsets": [[0], [0]],
    })
    df = spark.createDataFrame(
        pdf, "url string, h long, kind tinyint, xs array<double>, "
             "ys array<double>, ring_offsets array<int>")
    got = derive_epsilon(df)
    exp = Epsilon((100000.0, 5000000.0, 655000.0, 5300000.0))
    assert got.zero_relative == exp.zero_relative
    assert got.zero_absolute == exp.zero_absolute
    # map-unit extent (UTM-ish, ~10^7): zero_relative must NOT equal the
    # lon/lat-pinned WORLD_EPS value — using WORLD_EPS here would be wrong
    from geo_sim_processing_a_spark.plans.pipeline import WORLD_EPS
    assert got.zero_relative != WORLD_EPS.zero_relative


def test_knn_strict_guard_raises_on_too_fine_res(spark):
    """knn_join(strict=True) fails loudly when the resolution makes
    the ring-1 neighborhood smaller than the k-th neighbor distance."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.spark_joins import knn_join

    # 10 points spread ~1 degree apart; res=12 cells are ~0.09 x 0.04
    # degrees => the 5th neighbor is far outside ring-1
    pdf = pd.DataFrame({"pid": range(10),
                        "lon": [i * 1.0 for i in range(10)],
                        "lat": [0.0] * 10})
    pts = spark.createDataFrame(pdf, "pid long, lon double, lat double")
    with pytest.raises(Exception, match="coarser res"):
        knn_join(pts, k=5, res=12).collect()
    # strict=False returns the ring-local (possibly partial) result
    rows = knn_join(pts, k=5, res=12, strict=False).collect()
    assert isinstance(rows, list)
    # and the coarse-resolution call is exact and passes the guard
    assert len(knn_join(pts, k=5, res=2).collect()) == 10 * 5


def test_synthesized_multi_ring_invariants():
    """Every holed footprint has exactly 2 rings, hole strictly inside
    the exterior, both closed."""
    from geo_sim_processing_a_spark.functions.hashing import xxhash64_long
    from geo_sim_processing_a_spark.sources.pages import synthesize_geoms_pdf

    ids = np.arange(3000, dtype=np.int64)
    h = xxhash64_long(ids)
    urls = np.array([f"u{i}" for i in ids], dtype=object)
    pdf = synthesize_geoms_pdf(urls, h)
    polys = pdf[pdf["kind"] == 2]
    holed = polys[polys["ring_offsets"].map(len) == 2]
    assert len(holed) > 0
    for _, r in holed.iterrows():
        xs, ys = np.asarray(r["xs"]), np.asarray(r["ys"])
        assert len(xs) == 14  # 9-vertex bumped exterior + 5-vertex hole
        assert list(r["ring_offsets"]) == [0, 9]
        ex_x, in_x = xs[:9], xs[9:]
        ex_y, in_y = ys[:9], ys[9:]
        assert ex_x[0] == ex_x[-1] and in_x[0] == in_x[-1]
        assert in_x.min() > ex_x.min() and in_x.max() < ex_x.max()
        assert in_y.min() > ex_y.min() and in_y.max() < ex_y.max()
    # h selects holes exactly where pmod(h,21)==0 among footprints
    hsel = np.asarray(holed["h"], dtype=np.int64)
    assert (np.mod(hsel, 21) == 0).all()


def test_hypertable_rollup_incremental_refresh(spark, tmp_path):
    """Hypertable rollup: the second refresh recomputes ONLY buckets
    that received new (late) rows, and the materialization equals a
    full recompute."""
    import pandas as pd
    from pyspark.sql import functions as F
    from geo_sim_processing_a_spark.operators.hypertable import (
        read_rollup, refresh)

    def events(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                          "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        return spark.createDataFrame(
            pdf, "event_id long, user_id long, event_type string, "
                 "ts timestamp, value double")

    base = [(i, i % 3, "click" if i % 2 else "view",
             f"2025-01-01 {i % 4:02d}:{i % 60:02d}:00", float(i)) for i in range(40)]
    out = str(tmp_path / "rollup")
    r1 = refresh(spark, events(base), out)
    assert r1["buckets_total"] == 4 and r1["buckets_refreshed"] == 4

    # late rows land in ONE bucket (hour 02)
    late = base + [(100 + j, 0, "click", f"2025-01-01 02:0{j}:30", 9.5)
                   for j in range(3)]
    r2 = refresh(spark, events(late), out)
    assert r2["buckets_refreshed"] == 1, r2

    # materialization == full recompute
    got = {(str(r["bucket"]), r["event_type"]): (r["n_events"], r["total_value"])
           for r in read_rollup(spark, out).collect()}
    exp = {(str(r["bucket"]), r["event_type"]): (r["n_events"], r["total_value"])
           for r in (events(late)
                     .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
                     .agg(F.count("*").alias("n_events"),
                          F.round(F.sum("value"), 6).alias("total_value"))
                     .collect())}
    assert got == exp

    # idempotent: a third refresh with the same data touches nothing
    r3 = refresh(spark, events(late), out)
    assert r3["buckets_refreshed"] == 0


def test_hypertable_minute_buckets_survive_sibling_refresh(spark, tmp_path):
    """Minute-granular rollup: overwriting ONE changed minute-bucket
    must not delete sibling minute-buckets of the same hour (round-3
    ADVICE fix — bucket_key now carries the bucket's own granularity)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from geo_sim_processing_a_spark.operators.hypertable import (
        read_rollup, refresh)

    def events(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                          "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        return spark.createDataFrame(
            pdf, "event_id long, user_id long, event_type string, "
                 "ts timestamp, value double")

    # 5 minute-buckets inside the SAME hour
    base = [(i, 0, "click", f"2025-01-01 02:{i % 5:02d}:10", 1.0)
            for i in range(25)]
    out = str(tmp_path / "rollup_min")
    r1 = refresh(spark, events(base), out, bucket="minute")
    assert r1["buckets_total"] == 5

    # late row lands in minute 02:03 only
    late = base + [(900, 0, "click", "2025-01-01 02:03:40", 2.0)]
    r2 = refresh(spark, events(late), out, bucket="minute")
    assert r2["buckets_refreshed"] == 1
    got = read_rollup(spark, out)
    assert got.select("bucket").distinct().count() == 5, \
        "sibling minute-buckets were deleted by the partition overwrite"
    m3 = got.where(F.minute("bucket") == 3).collect()
    assert m3[0]["n_events"] == 6

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported bucket unit"):
        refresh(spark, events(base), out, bucket="millennium")
