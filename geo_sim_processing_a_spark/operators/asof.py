"""As-of (nearest-prior) join — the temporal-alignment operator
training-data pipelines use to attach the latest state to an event.

Shape chosen for 100 TB: NOT an inequality join (which Spark plans as
a broadcast-nested-loop) but the union-sort trick — one tag column,
one union, ONE sort-shuffle by (key, time), and a running last-value
window.  Wall-clock and shuffle volume are the same as a plain
sort-merge join of the two inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(left: DataFrame, right: DataFrame, on: str,
               left_time: str, right_time: str,
               value_cols: list, strict: bool = False) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with the same ``on`` key and right_time <= left_time
    (< left_time when ``strict``).  Left rows with no prior right row
    keep nulls.  Ties at equal timestamps: the right row wins for the
    non-strict variant (sorted right-before-left at the same instant),
    matching DuckDB's ASOF JOIN (>=) semantics."""
    lt = F.col(left_time)
    l_tag = left.select(
        F.col(on).alias("_k"), lt.alias("_t"), F.lit(1).alias("_src"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
        F.struct(*left.columns).alias("_row"))
    r_tag = right.select(
        F.col(on).alias("_k"), F.col(right_time).alias("_t"),
        F.lit(0 if not strict else 2).alias("_src"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"))
    unioned = l_tag.unionByName(r_tag)
    # non-strict: right rows sort BEFORE left rows at equal _t (src 0<1)
    # strict:     right rows sort AFTER  left rows at equal _t (src 2>1)
    w = (Window.partitionBy("_k").orderBy("_t", "_src")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        "_src", "_row",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_v_{c}")
          for c in value_cols])
    out = filled.where(F.col("_src") == 1)
    return out.select(
        *[F.col("_row")[c].alias(c) for c in
          out.select("_row.*").columns],
        *[F.col(f"_v_{c}").alias(f"asof_{c}") for c in value_cols])
