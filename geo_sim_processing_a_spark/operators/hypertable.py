"""Hypertable rollup — an incrementally-refreshed time-bucketed
continuous aggregate (the TimescaleDB-style operator the task brief
names).

Semantics:
 - the raw events table is bucketed on event time (``date_trunc``);
 - the rollup materializes one aggregate row per (bucket, event_type);
 - ``refresh`` recomputes ONLY buckets whose raw content changed
   since the last refresh — detected by (row count, order-independent
   content checksum), so in-place value edits with unchanged counts
   are caught too — and overwrites exactly those partitions (dynamic
   partition overwrite); untouched buckets are never rewritten;
 - the per-bucket state (raw row count, refresh generation) lives in a
   parquet manifest, so refresh is idempotent and restartable.

At scale the refresh cost is proportional to the CHANGED data, not the
table: the bucket-count delta pass is one aggregate over the raw
table's time column (min/max-prunable on a time-partitioned layout),
and the recompute filters to the changed buckets before aggregating.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_SCHEMA = "bucket timestamp, n_raw long, chk decimal(38,0), generation int"

# Partition-key format PER bucket unit: the key must be unique at the
# bucket's own granularity, else dynamic partition overwrite of one
# changed bucket silently deletes sibling buckets sharing the coarser
# key (e.g. all minutes of an hour under a yyyyMMddHH key).
_BUCKET_KEY_FMT = {
    "year": "yyyy", "quarter": "yyyyMM", "month": "yyyyMM",
    "week": "yyyyMMdd", "day": "yyyyMMdd", "hour": "yyyyMMddHH",
    "minute": "yyyyMMddHHmm", "second": "yyyyMMddHHmmss",
}


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_rollup_state")


def _with_bucket(events: DataFrame, time_col: str, bucket: str) -> DataFrame:
    return events.withColumn("bucket", F.date_trunc(bucket, F.col(time_col)))


def _read_state(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """None ONLY when the state path does not exist yet (first refresh).
    Any other read failure — corrupt footer, transient FS error —
    PROPAGATES: swallowing it would silently restart at generation 0,
    overwrite every bucket, and append duplicate state rows whose stale
    max-generation counts re-trigger full recomputes forever after."""
    from pyspark.errors import AnalysisException
    try:
        # mergeSchema: a migrated dir holds legacy (no-chk) AND current
        # state files — a single arbitrary footer would drop chk for
        # every row and re-trigger full refreshes forever
        state = (spark.read.option("mergeSchema", "true")
                 .parquet(_state_path(out_dir)))
    except AnalysisException as ex:
        msg = str(ex)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise
    # state-schema migration: out_dirs written before the chk column
    # existed read back as chk=NULL; the changed-bucket diff treats a
    # NULL stored chk as "changed", so old state dirs refresh once and
    # self-migrate instead of failing max_by("chk", ...) resolution
    if "chk" not in state.columns:
        state = state.withColumn("chk", F.lit(None).cast("decimal(38,0)"))
    return state


def refresh(spark: SparkSession, events: DataFrame, out_dir: str,
            time_col: str = "ts", bucket: str = "hour") -> dict:
    """Incrementally refresh the rollup at ``out_dir``.  Returns
    {"buckets_total", "buckets_refreshed", "generation"}."""
    if bucket not in _BUCKET_KEY_FMT:
        raise ValueError(f"unsupported bucket unit {bucket!r}; "
                         f"one of {sorted(_BUCKET_KEY_FMT)}")
    bucketed = _with_bucket(events, time_col, bucket)
    # persisted: consumed by the changed-bucket diff, the state write
    # AND buckets_total — without it each re-evaluation re-scans and
    # re-aggregates the full raw table, defeating the operator's
    # cost-proportional-to-changed-data contract
    # chk: EXACT decimal sum of per-row xxhash64 — order-independent
    # (decimal addition is associative) and content-sensitive, so a
    # bucket whose values changed but whose row count did not still
    # registers as changed
    row_hash = F.xxhash64(*[F.col(c) for c in events.columns]).cast("decimal(38,0)")
    counts = (bucketed.groupBy("bucket")
              .agg(F.count("*").alias("n_raw"),
                   F.sum(row_hash).alias("chk"))
              .persist())

    state = _read_state(spark, out_dir)
    if state is None:
        changed = counts
        generation = 0
    else:
        latest = (state.groupBy("bucket")
                  .agg(F.max("generation").alias("generation"),
                       F.max_by("n_raw", "generation").alias("n_raw"),
                       F.max_by("chk", "generation").alias("chk")))
        joined = counts.alias("c").join(latest.alias("s"), "bucket", "left")
        changed = (joined.where(F.col("s.n_raw").isNull()
                                # NULL stored chk = pre-migration state
                                # row: recompute once to materialize it
                                | F.col("s.chk").isNull()
                                | (F.col("c.n_raw") != F.col("s.n_raw"))
                                | (F.col("c.chk") != F.col("s.chk")))
                   .select("bucket", F.col("c.n_raw").alias("n_raw"),
                           F.col("c.chk").alias("chk")))
        generation = (state.agg(F.max("generation")).collect()[0][0] or 0) + 1

    changed_buckets = changed.select("bucket").persist()
    n_changed = changed_buckets.count()
    if n_changed:
        # exact decimal sum: refresh order / partial-agg order cannot
        # change the materialized values (double sums are
        # order-dependent in the last ulp); avg = exact sum as double /
        # count (IEEE division, engine-independent)
        dec_sum = F.sum(F.col("value").cast("decimal(28,8)")).cast("double")
        rollup = (bucketed.join(F.broadcast(changed_buckets), "bucket")
                  .groupBy("bucket", "event_type")
                  .agg(F.count("*").alias("n_events"),
                       F.round(dec_sum, 6).alias("total_value"),
                       F.round(dec_sum / F.count("*"), 6).alias("avg_value")))
        (rollup.withColumn("bucket_key",
                           F.date_format("bucket", _BUCKET_KEY_FMT[bucket]))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket_key")
         .parquet(os.path.join(out_dir, "rollup")))
        (changed.withColumn("generation", F.lit(generation).cast("int"))
         .select("bucket", "n_raw", "chk", "generation")
         .write.mode("append").parquet(_state_path(out_dir)))
    changed_buckets.unpersist()
    total = counts.count()
    counts.unpersist()
    return {"buckets_total": total, "buckets_refreshed": int(n_changed),
            "generation": generation}


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    return (spark.read.parquet(os.path.join(out_dir, "rollup"))
            .drop("bucket_key"))
