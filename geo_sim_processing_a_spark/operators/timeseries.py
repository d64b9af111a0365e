"""Time-series gap filling — the resample/fill stage between the
hypertable rollup and downstream analytics: a bucketed series with
missing buckets becomes a dense series with forward-filled values and
an explicit gap flag.

Scale shape (100 TB): the raw stream aggregates ONCE into buckets
(that hash-agg belongs to the caller — it is the same rollup every
dashboard needs anyway); gap_fill then works ONLY on bucket rows:
the spine explodes sequence(min, max, step) per series (bounded by
time-range/step, independent of raw row count), the fill window sorts
bucket rows per series, and nothing re-touches raw data.

Engine-exactness: bucket keys are integers; forward fill COPIES
values (no arithmetic), so DECIMAL aggregates stay exact through the
fill and the DuckDB twin (last_value IGNORE NULLS over the same
spine) hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(buckets: DataFrame, time_col: str, series_cols: list[str],
             value_cols: list[str], step: int) -> DataFrame:
    """Densify a bucketed time series: one row for EVERY ``step``
    between each series' first and last bucket, absent buckets
    forward-filled from the most recent earlier bucket and flagged
    ``gap = true``.

    ``buckets`` must be pre-aggregated: (series_cols..., time_col
    integer bucket start, value_cols...) with at most one row per
    (series, bucket) — duplicate bucket rows raise.  Leading buckets
    always exist (the spine starts at each series' own min), so
    forward fill is total."""
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if not series_cols or not value_cols:
        raise ValueError("series_cols and value_cols must be non-empty")
    t = F.col(time_col)
    # the duplicate guard rides INSIDE the used expression (a dropped
    # assert_true column would be pruned by Catalyst and never run)
    mn_checked = (F.col("_mn") + F.when(
        F.col("_nrows") == F.col("_nbuckets"), F.lit(0).cast("long"))
        .otherwise(F.raise_error(F.lit(
            "gap_fill: duplicate (series, bucket) rows — "
            "pre-aggregate first"))))
    spine = (buckets.groupBy(*series_cols)
             .agg(F.min(t).alias("_mn"), F.max(t).alias("_mx"),
                  F.count(F.lit(1)).alias("_nrows"),
                  F.countDistinct(t).alias("_nbuckets"))
             .select(*series_cols,
                     F.explode(F.sequence(
                         mn_checked, F.col("_mx"),
                         F.lit(step).cast("long"))).alias(time_col)))
    marked = buckets.withColumn("_present", F.lit(True))
    joined = spine.join(marked, series_cols + [time_col], "left")
    win = (Window.partitionBy(*series_cols).orderBy(time_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = joined
    for c in value_cols:
        filled = filled.withColumn(c, F.last(F.col(c), True).over(win))
    return (filled
            .withColumn("gap", F.col("_present").isNull())
            .select(*series_cols, time_col, *value_cols, "gap"))
