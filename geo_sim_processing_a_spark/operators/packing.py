"""Concat-and-chunk sequence packing for LLM training batches: lay the
corpus's token streams end-to-end in a deterministic document order and
cut the concatenation into fixed-length training sequences of
``seq_len`` tokens (the GPT/Megatron data-loader convention).  The
manifest maps every document to its place in that layout —
(token offset, first/last chunk, offset inside the first chunk) — so a
loader can materialize any chunk by fetching exactly the documents that
overlap it.

The semantics are a single global running sum of token counts in
doc-id order.  The naive Spark expression — a global ``Window.orderBy``
cumsum — moves the whole corpus to ONE partition (WindowExec warns
precisely about this), so here it is computed with the classic
two-pass distributed prefix sum instead:

  1. range-repartition rows by ``doc_id`` (one narrow shuffle; Spark's
     RangePartitioner guarantees partitions own disjoint ordered key
     ranges),
  2. per-partition token totals -> a #partitions-row offset table
     (bounded driver-side object, same envelope as kmeans seeds) whose
     running sum is each partition's global start offset, broadcast
     back,
  3. a within-partition window cumsum (parallel across partitions).

The OUTPUT is partitioning-invariant — range boundaries only shift
which partition computes a row, never its global offset — which is what
makes the op oracle-verifiable: the DuckDB twin (q_pack_manifest) uses
the plain global-window formulation as the semantic spec, and every
value hash-matches.  All arithmetic is integer (counts, floordiv, mod);
no float exists anywhere in the operator.

Scale notes (100 TB): one range shuffle of (doc_id, n_tokens) skinny
rows + one broadcast of a #partitions-row table + per-partition
windows.  The within-partition sort is the same work a shuffle-sort
does; there is no global single-partition stage.  Chunk-level stats
(chunks_stats) explode each doc into the chunks it overlaps — at most
``n_tokens/seq_len + 1`` rows per doc, i.e. the output is ~corpus
tokens / seq_len rows regardless of document skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _prefix_sum(df: DataFrame, order_col: str, val_col: str,
                out_col: str, partitions: int | None = None) -> DataFrame:
    """Adds ``out_col`` = sum of ``val_col`` over all rows with a
    strictly smaller ``order_col`` (exclusive global prefix sum),
    computed with the two-pass pattern documented in the module
    docstring.  ``order_col`` must be unique per row."""
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    t = (df.repartitionByRange(p, F.col(order_col))
         .withColumn("_pid", F.spark_partition_id())
         # materialize once: _pid must not be re-derived per consumer
         # (two jobs could re-sample range boundaries differently)
         .localCheckpoint(eager=False))
    totals = t.groupBy("_pid").agg(F.sum(val_col).alias("_ptot"))
    # running sum over the #partitions-row table: single-partition
    # window, but bounded by design (same envelope as kmeans seeds)
    off_w = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_ptot").over(off_w), F.lit(0))
        .cast("long").alias("_poff"))
    in_w = (Window.partitionBy("_pid").orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1))
    return (t.join(F.broadcast(offsets), "_pid")
            .withColumn(
                out_col,
                (F.col("_poff")
                 + F.coalesce(F.sum(val_col).over(in_w), F.lit(0)))
                .cast("long"))
            .drop("_pid", "_poff"))


def pack_manifest(docs: DataFrame, seq_len: int,
                  id_col: str = "doc_id",
                  tokens_col: str = "n_tokens") -> DataFrame:
    """Per-document packing manifest for fixed-length chunks of
    ``seq_len`` tokens over the concatenation of ``tokens_col`` in
    ``id_col`` order.  Requires ``tokens_col`` >= 1 (a zero-length
    document has no place in a token stream; filter first).

    Returns (id_col, n_tokens, tok_start, chunk_first, chunk_last,
    chunk_offset, n_chunks):

      tok_start    global offset of the doc's first token
      chunk_first  = tok_start // seq_len
      chunk_last   = (tok_start + n_tokens - 1) // seq_len
      chunk_offset = tok_start % seq_len (position inside chunk_first)
      n_chunks     number of chunks the doc overlaps
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    t = docs.select(F.col(id_col), F.col(tokens_col).cast("long")
                    .alias("n_tokens"))
    m = _prefix_sum(t, id_col, "n_tokens", "tok_start")
    end = F.col("tok_start") + F.col("n_tokens") - 1
    return m.select(
        id_col, "n_tokens", "tok_start",
        F.floor(F.col("tok_start") / seq_len).alias("chunk_first"),
        F.floor(end / seq_len).alias("chunk_last"),
        (F.col("tok_start") % seq_len).alias("chunk_offset"),
        (F.floor(end / seq_len) - F.floor(F.col("tok_start") / seq_len)
         + 1).alias("n_chunks"))


def chunk_stats(manifest: DataFrame, seq_len: int,
                id_col: str = "doc_id") -> DataFrame:
    """Per-chunk composition: how many documents contribute to each
    training sequence and how many of its tokens are document
    boundaries' partial spans.  Explodes each manifest row into the
    chunks it overlaps (~n_tokens/seq_len rows per doc) and aggregates
    on the int chunk id — one hash-agg shuffle.

    Returns (chunk_id, n_docs, n_tokens, first_doc, last_doc); every
    chunk except possibly the final one has n_tokens == seq_len.
    """
    ch = manifest.select(
        id_col, "tok_start", "n_tokens",
        F.explode(F.sequence("chunk_first", "chunk_last")).alias("chunk_id"))
    lo = F.greatest(F.col("chunk_id") * seq_len, F.col("tok_start"))
    hi = F.least((F.col("chunk_id") + 1) * seq_len,
                 F.col("tok_start") + F.col("n_tokens"))
    return (ch.withColumn("tok_in_chunk", (hi - lo).cast("long"))
            .groupBy("chunk_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("tok_in_chunk").alias("n_tokens"),
                 F.min(id_col).alias("first_doc"),
                 F.max(id_col).alias("last_doc")))
