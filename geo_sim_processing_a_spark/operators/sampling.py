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


def temperature_sample(df: DataFrame, target: int, alpha: float = 0.5,
                       group_col: str = "lang", content_col: str = "text",
                       nibbles: int = 3, s_scale: int = 1000) -> DataFrame:
    """Temperature-based group resampling toward a corpus of ~``target``
    rows (the multilingual α-sampling rule of mBERT/XLM-R/UniMax):
    group l with n_l rows is drawn with probability q_l ∝ n_l^α, so
    α=1 keeps the natural mixture, α=0 equalizes groups, and the
    standard α=0.5 boosts low-resource groups at the expense of the
    head.  Per-row acceptance rate is a_l = min(1, target·q_l / n_l),
    realized content-addressed (md5_bucket), so membership is a pure
    function of row content + corpus composition.

    Exactness across engines: n_l^α is materialized as the INTEGER
    score s_l (α∈{0, ½, 1}; ½ uses IEEE-correctly-rounded sqrt — both
    engines produce the identical double — then one identical
    multiply+floor), and the acceptance test is the integer
    cross-multiplication

        bucket · Σs · n_l  <  target · s_l · 16^nibbles

    evaluated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB twin), so no
    engine divides or compares floats anywhere.  The 38-digit envelope
    holds to ~1e12 rows per group with thousands of groups — beyond
    the 10^12-doc north-star scale.

    Scale notes: the stats side is one hash-agg to #groups rows plus a
    1-row total, broadcast back into the scan-stage filter join — the
    corpus itself never shuffles.  General α would need pow(), which
    IEEE leaves unrounded (engines may differ in the last ulp) —
    rejected here to keep the oracle exact; quantize upstream if an
    intermediate temperature is ever needed."""
    if target < 0:
        raise ValueError(f"target must be >= 0, got {target}")
    if alpha == 0.0:
        s_l = F.lit(s_scale).cast("long")
    elif alpha == 0.5:
        s_l = F.floor(F.sqrt(F.col("n_l")) * s_scale).cast("long")
    elif alpha == 1.0:
        s_l = (F.col("n_l") * s_scale).cast("long")
    else:
        raise ValueError(
            f"alpha must be one of 0, 0.5, 1 (exact-integer scores); "
            f"got {alpha}")
    from pyspark.sql.window import Window
    # s_tot folded into the #groups-row stats table with an
    # all-partition window (bounded by design, like packing's offset
    # table) — a 1-row crossJoin would plan as the lint-forbidden
    # BroadcastNestedLoopJoin
    stats = (df.groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("n_l"))
             .withColumn("s_l", s_l)
             .withColumn("s_tot", F.sum("s_l").over(
                 Window.partitionBy()).cast("long")))
    dec = "decimal(38,0)"
    b = md5_bucket(F.col(content_col), nibbles)
    lhs = (b.cast(dec) * F.col("s_tot").cast(dec) * F.col("n_l").cast(dec))
    rhs = (F.lit(int(target)).cast(dec) * F.col("s_l").cast(dec)
           * F.lit(16 ** nibbles).cast(dec))
    return (df.join(F.broadcast(stats), group_col)
            .where(lhs < rhs)
            .drop("n_l", "s_l", "s_tot"))


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


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    content_col: str = "text",
                    strata_cols: list[str] | None = None,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): keep the ``k`` rows with the largest
    u^(1/w), where u is a content-addressed uniform — so inclusion
    probability is proportional to weight, membership is a pure
    function of (content, weight) and survives any repartitioning, and
    no RNG state exists to coordinate across executors.

    Ranks by the equivalent ln(u)/w ASCENDING-negated form: the key is
    quantized to an integer in 1e-7 units BEFORE ranking (lm.py
    discipline) with (key desc, id asc) tie-break, so the selected set
    is engine-exact (driver twin: SQL_WEIGHTED_SAMPLE).  u is the
    exact dyadic (b + 1) / 2^52 from the 13-nibble md5 prefix —
    never 0, so ln is finite.  Rows with NULL or non-positive weight
    are excluded (zero weight = never sampled; E&S requires w > 0).

    With ``strata_cols``, the top-k applies per stratum via ONE window
    sort on the stratum key; without, a global TakeOrdered (no full
    sort).  At 100 TB the per-stratum window sorts each stratum once
    — the unavoidable shape for exact top-k; pre-filtering by a
    sampled key threshold can shed the bulk of rows first if strata
    are enormous (same two-pass idea as skew.frequency_cap).

    Returns the sampled rows with ``ws_key7`` (the quantized rank key)
    and ``ws_rank`` added.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for reserved in ("ws_key7", "ws_rank", "_u"):
        if reserved in df.columns:
            raise ValueError(f"weighted_sample reserves column "
                             f"{reserved!r}; rename it on the input first")
    strata_cols = list(strata_cols or [])
    w = F.col(weight_col).cast("double")
    b = md5_bucket(F.col(content_col), 13)          # 52 uniform bits
    u = (b + F.lit(1).cast("long")).cast("double") / F.lit(float(1 << 52))
    key7 = F.round(F.log(u) / w * F.lit(1e7)).cast("long")
    # NULL content must drop WITH the NULL/nonpositive weights: a NULL
    # rank key sorts last in Spark's DESC but FIRST in SQL engines'
    # default DESC, so letting it through would silently diverge
    ranked = (df.where(w.isNotNull() & (w > F.lit(0.0))
                       & F.col(content_col).isNotNull())
              .withColumn("ws_key7", key7))
    if strata_cols:
        from pyspark.sql.window import Window
        win = (Window.partitionBy(*strata_cols)
               .orderBy(F.col("ws_key7").desc(), F.col(id_col).asc()))
        return (ranked.withColumn("ws_rank", F.row_number().over(win))
                .where(F.col("ws_rank") <= k))
    # global: TakeOrdered via sort+limit (no full global sort at
    # scale); the rank window then runs over k rows only
    from pyspark.sql.window import Window
    topk = (ranked
            .orderBy(F.col("ws_key7").desc(), F.col(id_col).asc())
            .limit(k))
    win = Window.orderBy(F.col("ws_key7").desc(), F.col(id_col).asc())
    return topk.withColumn("ws_rank", F.row_number().over(win))
