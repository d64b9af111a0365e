"""The flagship pipeline (SURVEY.md §3.3):

  SCAN pages → PREP (text extract P9, dedup, geocode P10)
  → TILE (cell encode X6, halo cover X7) → SALT (X11)
  → KERNEL (groupBy(cell,salt).applyInPandas(reduce_bend | dp | vw))
  → CHECKPOINT (output parquet + lineage manifest S7) → RESUME

All geometry math is inside Arrow-batched kernels; everything else is
whole-stage-codegen Spark SQL.  The kernel stage shuffles exactly once
(the salted repartition doubles as the groupBy's required hashing via
the same keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.epsilon import Epsilon
from ..kernels import reduce_bend as RBK
from ..kernels.simplify import douglas_peucker_line, visvalingam_whyatt_line
from ..operators import cells as C
from ..operators.tiling import salt_by_cell, with_cell_cover
from ..sources import manifest as MF
from ..sources.pages import (extract_text_series, footprint_square,
                             geocode_hashes, trace_polyline)

GEOM_SCHEMA = ("url string, h long, kind tinyint, xs array<double>, ys array<double>")
KERNEL_OUT_SCHEMA = ("cell long, url string, kind tinyint, "
                     "xs array<double>, ys array<double>, "
                     "n_in int, n_out int, n_pass int, n_bend_reduced int")

# Epsilon for the geo pipeline is fixed from the global lon/lat domain
# (one R1-style agg would give the same value for any full-domain run;
# pinning it keeps every tile's kernel arithmetic identical, which the
# vertex-sequence parity requires).
WORLD_EPS = Epsilon((-180.0, -90.0, 180.0, 90.0))


# ---------------------------------------------------------------------------
# PREP: text extraction + geometry synthesis
# ---------------------------------------------------------------------------

def extracted_text_parity(pages: DataFrame) -> DataFrame:
    """P9 — recompute text from html in a pandas UDF and compare to the
    stored column; returns (url, ok). Byte-identity is asserted in
    tests and checked by count in the pipeline."""
    @F.pandas_udf("string")
    def extract_udf(html: pd.Series) -> pd.Series:
        return extract_text_series(html)

    return pages.select("url",
                        (extract_udf("html") == F.col("text")).alias("ok"))


def pages_to_geoms(pages: DataFrame) -> DataFrame:
    """P10 — geocode pages into geometry rows (points, footprint
    polygons for pmod(h,7)==0, trace polylines for pmod(h,3)==0).

    h is computed JVM-side (xxhash64 of the doc id parsed from the
    url) so Catalyst prunes/pushes around it; the geometry synthesis is
    one Arrow batch kernel."""
    with_h = (pages
              .withColumn("doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
              .withColumn("h", F.xxhash64("doc_id")))

    def gen(batches):
        for pdf in batches:
            h = pdf["h"].to_numpy()
            lon, lat, has_fp, side = geocode_hashes(h)
            urls = pdf["url"].to_numpy()
            rows = {"url": [], "h": [], "kind": [], "xs": [], "ys": []}

            def emit(u, hv, kind, coords):
                rows["url"].append(u)
                rows["h"].append(int(hv))
                rows["kind"].append(kind)
                rows["xs"].append(coords[:, 0])
                rows["ys"].append(coords[:, 1])

            for i in range(len(h)):
                emit(urls[i], h[i], 0, np.array([[lon[i], lat[i]]]))
                if has_fp[i]:
                    emit(urls[i], h[i], 2, footprint_square(lon[i], lat[i], side[i]))
                if h[i] % 3 == 0:
                    emit(urls[i], h[i], 1, trace_polyline(h[i], lon[i], lat[i]))
            yield pd.DataFrame(rows)

    return with_h.mapInPandas(gen, GEOM_SCHEMA)


def pages_to_covered_geoms(pages: DataFrame, res: int) -> DataFrame:
    """Fused P10 + X7: geometry synthesis AND halo cell cover in ONE
    Arrow stage.  Chaining two mapInPandas stages inside one task runs
    two Python workers per core (measured 3-10x wall regression at
    local[32] from the oversubscription); fusing keeps exactly one
    Python worker per task and halves the Arrow transport."""
    from ..operators.tiling import _cover_batch

    with_h = (pages
              .withColumn("doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long"))
              .withColumn("h", F.xxhash64("doc_id")))

    def gen(batches):
        for pdf in batches:
            h = pdf["h"].to_numpy()
            lon, lat, has_fp, side = geocode_hashes(h)
            urls = pdf["url"].to_numpy()
            rows = {"url": [], "h": [], "kind": [], "xs": [], "ys": []}

            def emit(u, hv, kind, coords):
                rows["url"].append(u)
                rows["h"].append(int(hv))
                rows["kind"].append(kind)
                rows["xs"].append(coords[:, 0])
                rows["ys"].append(coords[:, 1])

            for i in range(len(h)):
                emit(urls[i], h[i], 0, np.array([[lon[i], lat[i]]]))
                if has_fp[i]:
                    emit(urls[i], h[i], 2, footprint_square(lon[i], lat[i], side[i]))
                if h[i] % 3 == 0:
                    emit(urls[i], h[i], 1, trace_polyline(h[i], lon[i], lat[i]))
            yield _cover_batch(pd.DataFrame(rows), res)

    return with_h.mapInPandas(gen, GEOM_SCHEMA + ", cell long, is_owner boolean")


# ---------------------------------------------------------------------------
# KERNEL: per-tile simplification
# ---------------------------------------------------------------------------

def _reduce_bend_tile(cell, urls, kinds, xs, ys, owners,
                      diameter_tol: float, smooth: bool, out: dict,
                      epsilon=WORLD_EPS) -> None:
    """One (cell, salt) tile over pre-extracted column slices: run
    Sherbend over owned + halo features, append owned results to
    ``out``.  Caller guarantees deterministic (url, kind) order.
    ``epsilon=None`` derives the reference's data-dependent epsilon
    from the tile's own bbox (used by the golden-parity Spark tests);
    the pipeline pins WORLD_EPS so all tiles share one epsilon."""
    feats = []
    for i in range(len(urls)):
        coords = np.column_stack([np.asarray(xs[i]), np.asarray(ys[i])])
        feats.append(RBK.Feature(int(kinds[i]), [coords]))
    res = RBK.reduce_bends(feats, diameter_tol, smooth_line=smooth, epsilon=epsilon)
    n_reduced = int(sum(res.nbr_bend_reduced))
    for i, (fin, fout) in enumerate(zip(feats, res.features)):
        if not owners[i]:
            continue
        out["cell"].append(cell)
        out["url"].append(urls[i])
        out["kind"].append(int(kinds[i]))
        out["xs"].append(fout.rings[0][:, 0].tolist())
        out["ys"].append(fout.rings[0][:, 1].tolist())
        out["n_in"].append(int(sum(len(r) for r in fin.rings)))
        out["n_out"].append(int(sum(len(r) for r in fout.rings)))
        out["n_pass"].append(res.nbr_pass)
        out["n_bend_reduced"].append(n_reduced)


def _dp_tile(cell, urls, kinds, xs, ys, owners,
             tolerance: float, method: str, out: dict) -> None:
    """Independent-feature simplification over one tile's slices."""
    fn = douglas_peucker_line if method == "dp" else visvalingam_whyatt_line
    tol = tolerance if method == "dp" else tolerance * tolerance
    for i in range(len(urls)):
        if not owners[i]:
            continue
        coords = np.column_stack([np.asarray(xs[i]), np.asarray(ys[i])])
        simp = fn(coords, tol) if int(kinds[i]) == 1 and len(coords) > 2 else coords
        out["cell"].append(cell)
        out["url"].append(urls[i])
        out["kind"].append(int(kinds[i]))
        out["xs"].append(simp[:, 0].tolist())
        out["ys"].append(simp[:, 1].tolist())
        out["n_in"].append(len(coords))
        out["n_out"].append(len(simp))


def _kernel_out_pdf(out: dict) -> pd.DataFrame:
    """Typed empty-safe kernel output (Arrow needs object dtype for the
    array columns even when a (cell,salt) group owns nothing)."""
    return pd.DataFrame({
        "cell": pd.Series(out["cell"], dtype="int64"),
        "url": pd.Series(out["url"], dtype="object"),
        "kind": pd.Series(out["kind"], dtype="int8"),
        "xs": pd.Series(out["xs"], dtype="object"),
        "ys": pd.Series(out["ys"], dtype="object"),
        "n_in": pd.Series(out["n_in"], dtype="int32"),
        "n_out": pd.Series(out["n_out"], dtype="int32"),
        "n_pass": pd.Series(out["n_pass"], dtype="int32"),
        "n_bend_reduced": pd.Series(out["n_bend_reduced"], dtype="int32"),
    })


def _run_bucket(pdf: pd.DataFrame, tile_fn) -> pd.DataFrame:
    """Run ``tile_fn`` over each (cell, salt) tile of one bucket.
    Pandas work happens ONCE per bucket (sort + column extraction);
    tiles are numpy slices — per-tile overhead measured ~6 ms when
    done with per-tile DataFrames, ~0.1 ms this way."""
    out = {"cell": [], "url": [], "kind": [], "xs": [], "ys": [], "n_in": [],
           "n_out": [], "n_pass": [], "n_bend_reduced": []}
    if len(pdf) == 0:
        return _kernel_out_pdf(out)
    has_salt = "salt" in pdf.columns
    sort_cols = ["cell", "salt", "url", "kind"] if has_salt else ["cell", "url", "kind"]
    pdf = pdf.sort_values(sort_cols, kind="mergesort")
    cells = pdf["cell"].to_numpy()
    salts = pdf["salt"].to_numpy() if has_salt else np.zeros(len(pdf), dtype=np.int64)
    urls = pdf["url"].to_numpy()
    kinds = pdf["kind"].to_numpy()
    xs = pdf["xs"].to_numpy()
    ys = pdf["ys"].to_numpy()
    owners = pdf["is_owner"].to_numpy()
    # tile boundaries on the sorted (cell, salt) pairs
    change = np.flatnonzero((cells[1:] != cells[:-1]) | (salts[1:] != salts[:-1])) + 1
    bounds = np.concatenate([[0], change, [len(pdf)]])
    for b in range(len(bounds) - 1):
        lo, hi = bounds[b], bounds[b + 1]
        tile_fn(int(cells[lo]), urls[lo:hi], kinds[lo:hi],
                xs[lo:hi], ys[lo:hi], owners[lo:hi], out)
    return _kernel_out_pdf(out)


def _reduce_bend_kernel(pdf: pd.DataFrame, diameter_tol: float, smooth: bool,
                        epsilon=WORLD_EPS) -> pd.DataFrame:
    return _run_bucket(pdf, lambda c, u, k, x, y, o, out:
                       _reduce_bend_tile(c, u, k, x, y, o, diameter_tol, smooth, out,
                                         epsilon=epsilon))


def _dp_kernel(pdf: pd.DataFrame, tolerance: float, method: str) -> pd.DataFrame:
    return _run_bucket(pdf, lambda c, u, k, x, y, o, out:
                       _dp_tile(c, u, k, x, y, o, tolerance, method, out))


def simplify_tiles(geoms_with_cells: DataFrame, diameter_tol: float = 0.004,
                   kernel: str = "sherbend", smooth: bool = False,
                   n_buckets: int | None = None, epsilon=WORLD_EPS) -> DataFrame:
    """Per-tile kernels over halo-complete tiles.

    Tiles are BUCKETED before applyInPandas: one Spark group holds many
    (cell, salt) tiles and the kernel iterates them as numpy slices —
    per-group Arrow/pandas overhead is paid per bucket, not per tile.
    Tile semantics are unchanged: each (cell, salt) subgroup is
    processed independently, owners only are emitted."""
    if kernel == "sherbend":
        def bucket_fn(pdf):
            return _reduce_bend_kernel(pdf, diameter_tol, smooth, epsilon=epsilon)
    else:
        def bucket_fn(pdf):
            return _dp_kernel(pdf, diameter_tol, kernel)

    has_salt = "salt" in geoms_with_cells.columns
    spark = geoms_with_cells.sparkSession
    if n_buckets is None:
        # several waves of tasks: per-tile kernel cost is heterogeneous,
        # so more-tasks-than-cores evens out stragglers (measured ~40%
        # idle core-time with 1 task per core)
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32")) * 4

    # ONE shuffle: hash-partition by (cell, salt) — every tile lands
    # wholly in one partition — then run the kernel with mapInPandas
    # over whole partitions.  (groupBy().applyInPandas would add a
    # second shuffle after the salting repartition.)
    keys = [F.col("cell"), F.col("salt")] if has_salt else [F.col("cell")]
    parted = geoms_with_cells.repartition(n_buckets, *keys)

    def run(batches):
        # a tile must not straddle Arrow batches: gather the partition.
        # Partition size is bounded by salting's target_rows_per_task.
        pdfs = list(batches)
        if not pdfs:
            return
        yield bucket_fn(pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0])

    return parted.mapInPandas(run, KERNEL_OUT_SCHEMA)


# ---------------------------------------------------------------------------
# full pipeline with checkpoint/resume
# ---------------------------------------------------------------------------

def run_pipeline(spark: SparkSession, pages: DataFrame, out_dir: str,
                 res: int = 6, diameter_tol: float = 0.004,
                 kernel: str = "sherbend", smooth: bool = False,
                 target_rows_per_task: int = 20_000,
                 stage: str = "simplify") -> dict:
    """End-to-end run; resumable via the manifest in out_dir.
    Returns counters."""
    deduped = pages.dropDuplicates(["url"])
    # persisted: reused by the salting count pass and the kernel stage
    # (S4 — the reference's in-memory temp layers, SURVEY.md §2.1)
    covered = pages_to_covered_geoms(deduped, res).persist()
    covered.count()  # materialize once; multiple AQE stages consume it

    completed = MF.read_completed(spark, out_dir, stage)
    attempt = 0
    if completed is not None:
        prev = completed.agg(F.max("attempt")).collect()[0][0]
        if prev is None:
            completed = None  # manifest exists but not for this stage
        else:
            attempt = prev + 1
    todo = MF.prune_completed(covered, completed, tile_col="cell")

    salted = salt_by_cell(todo, key_col="url", cell_col="cell",
                          target_rows_per_task=target_rows_per_task)
    result = simplify_tiles(salted, diameter_tol, kernel, smooth)
    # idempotent per-attempt output dir: a re-run of the same attempt
    # overwrites rather than duplicating (S7 "latest complete attempt")
    # within-partition sort by cell: parquet row groups become
    # cell-clustered so downstream per-tile reads touch fewer pages
    # (no extra shuffle — sort is partition-local)
    (result.sortWithinPartitions("cell")
     .write.mode("overwrite").parquet(f"{out_dir}/data/stage={stage}/attempt={attempt}"))

    # per-tile counters for THIS attempt -> manifest
    new_data = spark.read.parquet(f"{out_dir}/data/stage={stage}/attempt={attempt}")
    rows = (new_data.groupBy("cell")
            .agg(F.count("*").alias("n_features"),
                 F.sum("n_in").alias("v_in"),
                 F.sum("n_out").alias("v_out"),
                 F.max("n_pass").alias("n_pass"),
                 F.max("n_bend_reduced").alias("n_bend_reduced"))).collect()
    mrows = MF.manifest_rows_for_partition(
        stage, [(r["cell"], r["n_features"],
                 {"v_in": int(r["v_in"]), "v_out": int(r["v_out"]),
                  "n_pass": int(r["n_pass"]), "n_bend_reduced": int(r["n_bend_reduced"])})
                for r in rows],
        attempt=attempt)
    if mrows:
        MF.append_manifest(spark.createDataFrame(mrows, MF.MANIFEST_SCHEMA), out_dir)

    written = spark.read.option("basePath", f"{out_dir}/data").parquet(f"{out_dir}/data")
    agg = written.agg(F.count("*").alias("geoms"),
                      F.countDistinct("cell").alias("tiles"),
                      F.sum("n_in").alias("v_in"),
                      F.sum("n_out").alias("v_out")).collect()[0]
    return {"geoms": agg["geoms"], "tiles": agg["tiles"],
            "v_in": int(agg["v_in"] or 0), "v_out": int(agg["v_out"] or 0)}
