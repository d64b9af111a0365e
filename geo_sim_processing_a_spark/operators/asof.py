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
    matching DuckDB's ASOF JOIN (>=) semantics.

    Semantics pinned by review: (1) the value columns travel as ONE
    struct, so the match is always a single right ROW — per-column
    last(ignorenulls) would stitch columns from different rows when the
    latest row has NULLs; (2) right rows with a NULL timestamp match
    nothing (a NULL satisfies no comparison — unfiltered they would
    sort NULLS FIRST and act as an 'earliest prior' for everything);
    (3) several right rows at the SAME (key, time) are ordered by a
    hash of their values, so the winner is arbitrary-but-deterministic
    across runs and partitionings.  The hash is only computed for
    right rows (for left rows it is a constant and to_json would be
    per-row wasted work).  Determinism caveat: to_json has no
    canonical key order for MAP-typed value columns — use struct or
    primitive ``value_cols`` when tie order must be reproducible."""
    lt = F.col(left_time)
    vstruct_type = F.struct(*[F.col(c) for c in value_cols])
    l_tag = left.select(
        F.col(on).alias("_k"), lt.alias("_t"), F.lit(1).alias("_src"),
        F.lit(None).cast(
            right.select(vstruct_type.alias("_v")).schema["_v"].dataType
        ).alias("_v"),
        F.struct(*left.columns).alias("_row"))
    r_tag = (right.where(F.col(right_time).isNotNull())
             .select(F.col(on).alias("_k"), F.col(right_time).alias("_t"),
                     F.lit(0 if not strict else 2).alias("_src"),
                     vstruct_type.alias("_v"),
                     F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row")))
    unioned = l_tag.unionByName(r_tag)
    # non-strict: right rows sort BEFORE left rows at equal _t (src 0<1)
    # strict:     right rows sort AFTER  left rows at equal _t (src 2>1)
    # _tie: deterministic order among right rows tied on (_k, _t)
    w = (Window.partitionBy("_k")
         .orderBy("_t", "_src",
                  F.when(F.col("_src") != 1, F.xxhash64(F.to_json("_v")))
                  .otherwise(F.lit(0)))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        "_src", "_row",
        F.last("_v", ignorenulls=True).over(w).alias("_v"))
    out = filled.where(F.col("_src") == 1)
    return out.select(
        *[F.col("_row")[c].alias(c) for c in
          out.select("_row.*").columns],
        *[F.col("_v")[c].alias(f"asof_{c}") for c in value_cols])
