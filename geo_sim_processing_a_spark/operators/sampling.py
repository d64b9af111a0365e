"""Deterministic, engine-portable sampling and train/valid/test
splitting for corpus curation.

The bucket is the integer value of the first ``nibbles`` hex characters
of md5 of the row content — byte-identical in every engine with an
md5-hex function (Spark, DuckDB, Trino, BigQuery), so a 100-TB split is
reproducible across systems, stable under repartitioning (it is
content-addressed, not position- or RNG-based), and needs no shuffle:
the bucket is a narrow scalar expression evaluated inside the scan
stage with whole-stage codegen (no UDF, no exchange).

Contrast with ``DataFrame.sample``: Spark's sampler is seeded per
partition, so the selected rows CHANGE whenever the partitioning does —
unusable for a durable held-out set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_bucket(col: Column, nibbles: int = 3) -> Column:
    """Integer in [0, 16**nibbles) from the first ``nibbles`` hex chars
    of md5(utf-8 bytes of ``col``).  DuckDB twin:
    ``('0x' || substr(md5(x), 1, nibbles))::UBIGINT``.

    NULL content propagates: the bucket is NULL, so NULL rows are
    DROPPED by deterministic_sample/domain_mix (NULL < t is not true)
    and assigned 'train' by deterministic_split (no WHEN matches) —
    identical semantics in Spark and DuckDB.  Filter NULLs first if
    they must be handled differently."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, nibbles),
                  16, 10).cast("long")


def deterministic_sample(df: DataFrame, col: str, frac: float,
                         nibbles: int = 3) -> DataFrame:
    """Keep ~``frac`` of rows, chosen by content hash of ``col``.
    Exact membership is a pure function of the row content."""
    buckets = 16 ** nibbles
    return df.where(md5_bucket(F.col(col), nibbles) < int(buckets * frac))


def deterministic_split(df: DataFrame, col: str = "text",
                        test_frac: float = 0.1, valid_frac: float = 0.1,
                        nibbles: int = 3,
                        out_col: str = "split") -> DataFrame:
    """Adds ``out_col`` in {'test','valid','train'} — a durable
    content-addressed split (identical rows always land in the same
    split, on any engine, at any scale)."""
    buckets = 16 ** nibbles
    n_test = int(buckets * test_frac)
    n_valid = int(buckets * valid_frac)
    b = md5_bucket(F.col(col), nibbles)
    return df.withColumn(
        out_col,
        F.when(b < n_test, F.lit("test"))
         .when(b < n_test + n_valid, F.lit("valid"))
         .otherwise(F.lit("train")))


def domain_mix(df: DataFrame, fractions: dict, source_col: str = "source",
               content_col: str = "text", default: float = 1.0,
               nibbles: int = 3) -> DataFrame:
    """Deterministic per-source reweighting toward a target training
    mixture: keep a content-addressed ``fractions[source]`` of each
    source's rows (``default`` for unlisted sources).

    The per-source threshold is a literal CASE expression over the
    md5 bucket — a scalar predicate evaluated inside the scan stage
    (zero shuffle, no UDF), reproducible on any engine and under any
    partitioning.  Downsampling only (fractions > 1 raise): upsampling
    duplicates rows and belongs to the loader, not the corpus."""
    bad = {k: v for k, v in {**fractions, "default": default}.items()
           if not (0.0 <= v <= 1.0)}
    if bad:
        raise ValueError(f"domain_mix fractions must be in [0, 1]: {bad}")
    buckets = 16 ** nibbles
    thr = F.lit(int(buckets * default))
    for src, frac in sorted(fractions.items()):
        thr = F.when(F.col(source_col) == src,
                     F.lit(int(buckets * frac))).otherwise(thr)
    return df.where(md5_bucket(F.col(content_col), nibbles) < thr)
