"""Hot-key frequency guard for candidate-pair self-joins.

Every near-dup path (MinHash-LSH bands, SimHash bands, winnowing
fingerprints) generates candidates with a self-equi-join on a bucket
key; the join output is QUADRATIC per key — one "stop fingerprint" or
degenerate band value shared by k documents makes k^2 candidate rows
before any verification runs.  At 100 TB a single boilerplate-heavy
crawl segment recreates this; AQE's skew-join splits the shuffle but
not the k^2 row blow-up.

``frequency_cap`` counts rows per join key and DROPS keys above a cap
— reporting exactly what was dropped (no silent caps).  The count pass
is one partial+final hash aggregate over the bucket rows; the hot-key
set is tiny by construction (keys above the cap are rare) so the
anti-join is broadcast.

Recall bound (document per the no-silent-caps rule): a pair is lost
only if EVERY key it shares is hot.  Near-dup pairs share many keys
(multiple bands / many fingerprints), so the loss concentrates on
pairs whose entire overlap is ubiquitous boilerplate — exactly the
pairs a dedup pipeline does not want driving its candidate volume.
Callers pass ``hot_key_cap=None`` to disable the guard when exactness
over skewed keys matters more than bounded runtime.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

# above this many hot keys, don't collect them — use a distributed
# anti-join instead (degenerate-input backstop; see frequency_cap)
MAX_DRIVER_HOT_KEYS = 10_000


def frequency_cap(buckets: DataFrame, key_cols: Sequence[str], cap: int,
                  label: str,
                  log_fn: Optional[Callable[[str], None]] = None,
                  eager: bool = True) -> DataFrame:
    """Drop all rows of join keys occurring in more than ``cap`` rows,
    reporting the drop.  Returns the filtered frame (same schema).

    With ``eager=True`` (default) the hot-key set is evaluated AT CALL
    TIME — merely constructing a plan through this function runs the
    count job plus whatever computes ``buckets`` (callers checkpoint
    their signature frames for this reason).  In the expected case the
    set is small (above-cap keys are rare) and is collected and rebuilt
    as a literal broadcast frame — ONE aggregation pass total, where
    embedding the lazy plan would re-run the full count() when the
    caller's action executes.  A degenerate input with more than
    ``MAX_DRIVER_HOT_KEYS`` hot keys falls back to the distributed
    anti-join (the count aggregation runs twice, but nothing unbounded
    ever reaches the driver).

    ``eager=False`` is the plan-only variant (ADVICE r3): no job runs
    until the caller's action — the hot-key filter is embedded as a
    distributed broadcast anti-join, the bucket rows are counted twice
    at execution, and NO drop report can be logged (the counts aren't
    known driver-side).  Use it when composing plans that may never
    execute (plan dumps, speculative pipelines).
    """
    if cap <= 0:
        raise ValueError(f"hot-key cap must be positive, got {cap}")
    key_cols = list(key_cols)
    counts = buckets.groupBy(*key_cols).count()
    hot = counts.where(F.col("count") > cap)
    if not eager:
        # no broadcast HINT: the hot set is unbounded here, and an
        # explicit hint bypasses autoBroadcastJoinThreshold (driver
        # OOM on degenerate inputs); AQE still broadcasts when small
        return buckets.join(hot.select(*key_cols), key_cols, "left_anti")
    hot_rows = hot.limit(MAX_DRIVER_HOT_KEYS + 1).collect()
    if not hot_rows:
        return buckets
    if len(hot_rows) <= MAX_DRIVER_HOT_KEYS:
        n_dropped = sum(r["count"] for r in hot_rows)
        msg = (f"[{label}] hot-key guard: dropped {len(hot_rows)} join "
               f"key(s) with > {cap} rows each ({n_dropped} bucket "
               f"rows) before the candidate self-join; pairs whose ONLY shared "
               f"keys were dropped are not recalled")
        (log_fn or _LOG.warning)(msg)
        spark = buckets.sparkSession
        lit = spark.createDataFrame(
            [tuple(r[c] for c in key_cols) for r in hot_rows],
            buckets.select(*key_cols).schema)
        return buckets.join(F.broadcast(lit), key_cols, "left_anti")
    stats = hot.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("count"), F.lit(0)).alias("dropped")).collect()[0]
    msg = (f"[{label}] hot-key guard: {stats['n']} hot join keys (> "
           f"{MAX_DRIVER_HOT_KEYS} — degenerate input); dropping "
           f"{stats['dropped']} bucket rows via a distributed anti-join")
    (log_fn or _LOG.warning)(msg)
    # same: unbounded hot set -> no broadcast hint (AQE decides)
    return buckets.join(hot.select(*key_cols), key_cols, "left_anti")
