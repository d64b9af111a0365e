"""Checkpoint / lineage manifest — resumable batch runs (SURVEY.md S7).

Iceberg is unavailable in-sandbox (no runtime jar, no network), so the
manifest is a parquet directory implementing the same semantics:

 - each completed unit of work APPENDS one row
   (stage, tile, attempt, n_features, counters_json, ts); re-runs may
   append duplicate (stage, tile) rows — readers resolve them
   (read_completed takes max(attempt); prune_completed distincts), so
   the manifest is append-only-with-dedup-on-read, like an Iceberg
   manifest list, not overwrite-in-place;
 - on restart, completed (stage, tile) pairs are read and the work
   DataFrame is pruned with a broadcast left_anti join — only missing
   tiles re-run (north_rule "resume mid-shuffle" at batch granularity:
   the shuffle feeding the kernel stage only materializes the missing
   tiles' partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def manifest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_manifest")


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence via the Hadoop FileSystem API, so resume works for ANY
    out_dir scheme Spark can write (hdfs://, s3a://, file:, bare local
    paths).  A driver-local os.path.exists would return False for every
    remote URI and silently discard all resume state (ADVICE r3)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def fs_read_text(spark: SparkSession, path: str) -> str:
    """Small-file text read through the Hadoop FS API (works for any
    scheme the cluster can reach, unlike driver-local open())."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        return str(jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"))
    finally:
        stream.close()


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create-exclusive small-file text write through the Hadoop FS API
    (overwrite=False: a concurrent creator loses with a
    FileAlreadyExistsException rather than silently clobbering)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, False)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_completed(spark: SparkSession, base_dir: str, stage: str) -> DataFrame | None:
    """None means 'no manifest yet' — ONLY the path-missing case.  A
    manifest that exists but cannot be read (corrupt file, transient FS
    error) RAISES: silently returning None would discard all resume
    state and re-run every tile on top of the masked error."""
    path = manifest_path(base_dir)
    if not fs_exists(spark, path):
        return None
    mf = spark.read.parquet(path)
    return (mf.where(F.col("stage") == stage)
              .groupBy("tile").agg(F.max("attempt").alias("attempt")))


def prune_completed(work: DataFrame, completed: DataFrame | None,
                    tile_col: str = "tile") -> DataFrame:
    """left_anti join away tiles already in the manifest (broadcast —
    the manifest is tiny relative to the data)."""
    if completed is None:
        return work
    return work.join(F.broadcast(completed.select(F.col("tile").alias(tile_col)).distinct()),
                     on=tile_col, how="left_anti")


def append_manifest(df: DataFrame, base_dir: str) -> None:
    df.write.mode("append").parquet(manifest_path(base_dir))
