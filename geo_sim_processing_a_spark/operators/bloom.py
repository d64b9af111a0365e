"""Incremental snapshot deduplication with an explicit distributed
Bloom filter — the "new crawl vs existing corpus" stage of a
training-data pipeline.

At 10^12-document scale a naive ``new LEFT ANTI JOIN old`` reshuffles
the ENTIRE existing corpus on every incoming snapshot.  The Bloom path
materializes the old corpus's key membership ONCE as an m-bit bitmap
(one parquet row per 64-bit word — reusable across snapshots, tiny,
broadcastable), so a new snapshot only needs:

  1. probe: k hash positions per DISTINCT new key, one broadcast join
     against the <= m/64-row word table (map-side; the corpus itself
     never shuffles),
  2. exact confirm: only the bloom-POSITIVE minority (true duplicates
     + the controlled false-positive tail) anti-joins against the old
     key set.

Bloom filters have no false negatives, so the result is EXACTLY the
plain anti-join — which is therefore the DuckDB oracle for the driver
query (q_incremental_dedup): every hash-match run proves the bitmap
machinery end-to-end.

All JVM-side (xxhash64 / pmod / shiftleft / bit_or / bitwiseAND; no
UDF).  Spark's own runtime bloom pruning (spark.sql.optimizer.
runtimeFilter.bloomFilter) is join-local and not persistable; this one
is an explicit, reusable artifact with chosen m/k.

Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the confirm join's
right side is n_dup + fpr * n_novel rows — pick m ~ 10-16 bits/key
(k=5..7) so the exact join degenerates to a sliver.  The word table is
m/64 rows (m = 2^30 -> 16M longs = 128 MB, still broadcast-viable; go
shuffle-join for larger m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 18
DEFAULT_K = 5


def _positions(key, m_bits: int, k: int):
    """array<long> of the k bloom bit positions for one key column."""
    return F.array([F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits))
                    for s in range(k)])


def bloom_build(keys: DataFrame, key_col: str = "key",
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> DataFrame:
    """Build the bitmap word table (word_idx: long, bits: long) over a
    key column.  ONE hash-aggregate shuffle to <= m/64 rows; input need
    not be distinct (bit_or is idempotent), so no pre-shuffle.  Persist
    the result next to the corpus snapshot and reuse it for every
    incoming batch."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = keys.select(
        F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos"))
    return (pos
            .select((F.col("pos") / 64).cast("long").alias("word_idx"),
                    F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")
                    .alias("mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("bits"))
            # parameters ride WITH the artifact: probing with different
            # m/k than the build would silently create false negatives,
            # so consumers verify these instead of trusting the caller
            .withColumn("m_bits", F.lit(int(m_bits)).cast("long"))
            .withColumn("k", F.lit(int(k)).cast("int")))


def _check_bloom_params(bloom: DataFrame, m_bits: int, k: int) -> None:
    """Refuse to probe an artifact built with different parameters
    (1-row bounded-driver check; legacy tables without the metadata
    columns are rejected loudly rather than mis-probed)."""
    if "m_bits" not in bloom.columns or "k" not in bloom.columns:
        raise ValueError(
            "bloom word table lacks m_bits/k metadata columns — "
            "rebuild it with bloom_build (probing with mismatched "
            "parameters would produce silent false negatives)")
    row = bloom.select("m_bits", "k").first()
    if row is not None and (int(row["m_bits"]) != int(m_bits)
                            or int(row["k"]) != int(k)):
        raise ValueError(
            f"bloom artifact was built with m_bits={row['m_bits']}, "
            f"k={row['k']} but caller asked for m_bits={m_bits}, k={k}")


def bloom_positive_keys(new_keys: DataFrame, bloom: DataFrame,
                        key_col: str = "key",
                        m_bits: int = DEFAULT_M_BITS,
                        k: int = DEFAULT_K) -> DataFrame:
    """Distinct keys of ``new_keys`` that the bloom CANNOT rule out
    (all k probe bits set).  Probe rows broadcast-join the word table;
    a missing word_idx row means the bit is 0 (LEFT join, miss)."""
    _check_bloom_params(bloom, m_bits, k)
    bloom = bloom.select("word_idx", "bits")
    probes = (new_keys.select(key_col).distinct()
              .select(key_col,
                      F.explode(_positions(F.col(key_col), m_bits, k))
                      .alias("pos"))
              .select(key_col,
                      (F.col("pos") / 64).cast("long").alias("word_idx"),
                      F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")
                      .alias("mask")))
    hit = (probes.join(F.broadcast(bloom), "word_idx", "left")
           .withColumn("hit",
                       F.coalesce(F.col("bits"), F.lit(0))
                       .bitwiseAND(F.col("mask")) != 0))
    return (hit.groupBy(key_col)
            .agg(F.min("hit").alias("_all_hit"))
            .where(F.col("_all_hit"))
            .select(key_col))


def incremental_dedup(new: DataFrame, old_keys: DataFrame,
                      key_col: str = "key",
                      m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                      bloom: DataFrame = None,
                      with_path_flag: bool = False) -> DataFrame:
    """Rows of ``new`` whose ``key_col`` does NOT appear in
    ``old_keys`` — bit-exactly the plain anti-join, computed the
    snapshot-scale way: bloom prefilter (no false negatives) + exact
    anti-join confirm restricted to the bloom-positive sliver.

    Pass a prebuilt ``bloom`` (from :func:`bloom_build`, e.g. read
    back from the snapshot artifact) to skip rebuilding it.
    ``with_path_flag`` adds ``via_confirm`` (True = the row survived
    the exact confirm join, False = the bloom alone proved novelty) —
    for tests/metrics; production drops it."""
    for reserved in ("_pos", "via_confirm"):
        if reserved in new.columns:
            raise ValueError(
                f"incremental_dedup reserves column name {reserved!r}; "
                "rename it on the input first")
    if bloom is None:
        bloom = bloom_build(old_keys, key_col, m_bits, k)
    pos = bloom_positive_keys(new, bloom, key_col, m_bits, k)
    flagged = new.join(pos.withColumn("_pos", F.lit(True)),
                       key_col, "left")
    definite = (flagged.where(F.col("_pos").isNull()).drop("_pos")
                .withColumn("via_confirm", F.lit(False)))
    confirmed = (flagged.where(F.col("_pos")).drop("_pos")
                 .join(old_keys.select(key_col).distinct(),
                       key_col, "left_anti")
                 .withColumn("via_confirm", F.lit(True)))
    out = definite.unionByName(confirmed)
    return out if with_path_flag else out.drop("via_confirm")
