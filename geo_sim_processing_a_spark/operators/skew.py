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


def frequency_cap(buckets: DataFrame, key_cols: Sequence[str], cap: int,
                  label: str,
                  log_fn: Optional[Callable[[str], None]] = None) -> DataFrame:
    """Drop all rows of join keys occurring in more than ``cap`` rows,
    reporting the drop.  Returns the filtered frame (same schema).

    The stats aggregate is evaluated eagerly (it is one row); when the
    input is (local-)checkpointed by the caller, the pass reads the
    materialized blocks rather than recomputing the signature kernel.
    """
    if cap <= 0:
        raise ValueError(f"hot-key cap must be positive, got {cap}")
    key_cols = list(key_cols)
    # ONE aggregation pass: the hot keys are tiny by construction
    # (above-cap keys are rare), so collect them with their counts and
    # rebuild the anti-join side as a literal frame — embedding the
    # lazy `hot` plan instead would re-run the full count() aggregation
    # a second time when the caller's action executes
    hot_rows = (buckets.groupBy(*key_cols).count()
                .where(F.col("count") > cap).collect())
    if hot_rows:
        n_dropped = sum(r["count"] for r in hot_rows)
        msg = (f"[{label}] hot-key guard: dropped {len(hot_rows)} join "
               f"key(s) with > {cap} rows each ({n_dropped} bucket "
               f"rows) before the candidate self-join; pairs whose ONLY shared "
               f"keys were dropped are not recalled")
        (log_fn or _LOG.warning)(msg)
        spark = buckets.sparkSession
        hot = spark.createDataFrame(
            [tuple(r[c] for c in key_cols) for r in hot_rows],
            buckets.select(*key_cols).schema)
        return buckets.join(F.broadcast(hot), key_cols, "left_anti")
    return buckets
