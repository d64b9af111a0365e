"""Bucketed tables for co-located joins (SURVEY.md scale guidance):
writing both sides bucketed+sorted on the join key lets Spark plan a
SortMergeJoin with NO Exchange on either side — at 100 TB this is the
difference between a full-corpus shuffle per join and none.

Uses the session's Hive-less in-memory catalog + spark.sql.warehouse.dir
(parquet under the warehouse path); `saveAsTable` is required because
bucket metadata lives in the catalog, not in parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a parquet table bucketed AND sorted by ``key``.
    Joins between tables bucketed on the same key with the same bucket
    count plan with NO Exchange on either side (the 100 TB win — no
    shuffle; a partition-local SortExec remains in the plan: Spark 3+
    does not propagate bucketed-scan output ordering, so the pre-sorted
    runs are re-sorted in memory, which is cheap and shuffle-free).

    The repartition is load-bearing for file layout: without it a
    multi-partition input writes one file per (task, bucket) — a
    small-files explosion of up to partitions x buckets files."""
    (df.repartition(n_buckets, key)
       .write.mode(mode)
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two same-key same-bucket-count tables; the physical plan
    must contain no Exchange (asserted in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
