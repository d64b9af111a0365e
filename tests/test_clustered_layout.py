"""Cell-clustered parquet layout (sources/clustered.py): row-group
pruning evidence straight from the parquet footers, plus result
equivalence between the clustered and unclustered layouts."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geo_sim_processing_a_spark.sources.clustered import (
    read_cell_range, write_cell_clustered)


def _demo_df(spark, n=40_000):
    # pseudo-random cell ids over a 2^20 key space, plus a payload —
    # xxhash scatter stands in for crawl-order arrival
    return (spark.range(n)
            .withColumn("cell", F.pmod(F.xxhash64("id"), F.lit(1 << 20)))
            .withColumn("payload", F.md5(F.col("id").cast("string"))))


def _row_group_ranges(path):
    out = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["cell"]).statistics
            out.append((st.min, st.max))
    return out


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cluster")
    clustered, unclustered = str(base / "c"), str(base / "u")
    df = _demo_df(spark)
    write_cell_clustered(df, clustered, n_files=8)
    # same rows, hash-scattered writer partitions = crawl-order layout
    (df.repartition(8, "payload").write.mode("overwrite")
       .parquet(unclustered))
    return clustered, unclustered


def test_clustered_row_groups_have_disjoint_narrow_ranges(layouts):
    clustered, unclustered = layouts
    probe_lo, probe_hi = 100_000, 140_000   # ~3.8% of the key space

    def hit_fraction(path):
        ranges = _row_group_ranges(path)
        assert ranges, path
        hits = sum(1 for lo, hi in ranges
                   if not (hi < probe_lo or lo > probe_hi))
        return hits / len(ranges)

    # crawl-order: every row group spans ~the whole key space -> the
    # probe intersects all of them.  clustered: only the few row groups
    # owning the probed range qualify.
    assert hit_fraction(unclustered) == 1.0
    assert hit_fraction(clustered) <= 0.25


def test_clustered_files_own_disjoint_cell_ranges(layouts):
    clustered, _ = layouts
    per_file = []
    for f in glob.glob(clustered + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["cell"]).statistics
            mins.append(st.min)
            maxs.append(st.max)
        per_file.append((min(mins), max(maxs)))
    per_file.sort()
    for (_, hi_a), (lo_b, _) in zip(per_file, per_file[1:]):
        assert hi_a <= lo_b   # repartitionByRange: disjoint file ranges


def test_range_scan_identical_rows_and_pushdown(spark, layouts):
    clustered, unclustered = layouts
    lo, hi = 100_000, 140_000
    a = read_cell_range(spark, clustered, lo, hi)
    b = read_cell_range(spark, unclustered, lo, hi)
    got_a = sorted((r["id"], r["cell"]) for r in a.collect())
    got_b = sorted((r["id"], r["cell"]) for r in b.collect())
    assert got_a == got_b and len(got_a) > 100
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(cell" in plan and "LessThanOrEqual(cell" in plan
