"""Cell-clustered parquet layout: the storage-side half of the spatial
engine's scale story.

A Morton cell id (operators/cells.py) is already a Z-order key — rows
sorted by cell are spatially clustered, so every parquet row group's
``[min(cell), max(cell)]`` statistic spans a narrow key range.  A scan
with a cell predicate (the shape every PIP / range / kNN candidate
read produces after cover_bbox) then skips almost every row group at
footer time: the decisive I/O lever at 100 TB, where the difference
between "read 4 row groups" and "read all of them" IS the query time.

``write_cell_clustered`` is deliberately a plain DataFrame recipe:

  repartitionByRange(cell)   -- range-partitions the key space, so each
                                output FILE owns a disjoint cell range
                                (file-level pruning via footer stats)
  sortWithinPartitions(cell) -- orders rows inside each file, so each
                                ROW GROUP owns a narrow sub-range
                                (row-group-level pruning)

Range partitioning samples the key distribution, so hot cells spread
over several files instead of one skewed writer task.  No custom file
format, no index sidecar: the "index" is parquet's own min/max
statistics, which Spark's parquet reader (and DuckDB, and any other
engine) already consults when a pushed filter arrives.

tests/test_clustered_layout.py proves the claim from the footers
themselves (pyarrow row-group statistics): a cell-range probe
intersects a small fraction of clustered row groups but essentially
all row groups of the same data written in hash order, and the
Spark-side scan returns identical rows from both layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_cell_clustered(df: DataFrame, path: str, cell_col: str = "cell",
                         n_files: int = 8) -> None:
    """Write ``df`` as parquet range-clustered on ``cell_col`` (see
    module docstring).  ``n_files`` bounds the file count — at cluster
    scale pick roughly (total bytes / 512 MB)."""
    (df.repartitionByRange(n_files, F.col(cell_col))
       .sortWithinPartitions(cell_col)
       .write.mode("overwrite").parquet(path))


def read_cell_range(spark: SparkSession, path: str, lo: int, hi: int,
                    cell_col: str = "cell") -> DataFrame:
    """Scan with an inclusive cell-range predicate.  The BETWEEN lands
    in PushedFilters, so parquet prunes row groups from footer stats
    before any page is decoded."""
    return (spark.read.parquet(path)
            .where(F.col(cell_col).between(F.lit(lo), F.lit(hi))))
