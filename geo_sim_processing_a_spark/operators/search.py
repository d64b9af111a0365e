"""BM25 full-text relevance scoring (Robertson/Spärck Jones; the
Lucene-variant formula) — the lexical counterpart of the embedding
similarity layer: given a bag-of-terms query, score every document by

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1)
                        / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))

with idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)) (always
positive, Lucene's shift).

Engine-exactness: both engines evaluate the per-term score with the
IDENTICAL parenthesization of IEEE double ops (the discipline proven
by tfidf's 15k-row ln() hash match), then quantize it to an INTEGER in
1e-7 units BEFORE the per-document sum (operators/lm.py discipline —
integer sums are associative, double sums are not).  N and
total-token-count enter as exact integer literals; k1/b as the same
decimal literals, parsed to the same doubles everywhere.

Scale notes (100 TB): the token stream is filtered to the query's
terms INSIDE the scan stage (isin over a literal array — predicate on
the exploded stream, so non-matching tokens never reach a shuffle);
df/tf collapse to at most |query| and |query|·N_matched rows; document
lengths are one hash-agg over the token stream (computed anyway by any
quality stage and joinable from there); the final top-k is
TakeOrdered, never a global sort.  The two corpus scalars (N, total
tokens) are a single bounded 1-row collect — same idiom as the tfidf
vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WS_CLASS


def bm25_search(docs: DataFrame, query_terms: list[str], k: int = 20,
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query by BM25, ordered by
    (score7 desc, id).  Returns (id_col, n_match_terms, score7) with
    score7 = the integer-quantized score in 1e-7 units (divide by 1e7
    for the conventional float score).  Duplicate query terms are
    collapsed; documents matching no term are absent."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = (docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), WS_CLASS + "+"))
        .alias("term"))
        .where(F.col("term") != ""))
    # document length over the full stream; one hash-agg on _id
    dl = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("dl"))
    # bounded 1-row collect for the two corpus scalars (tfidf-N idiom)
    n_docs, total_tokens = dl.agg(
        F.count(F.lit(1)), F.sum("dl")).first()
    avgdl = F.lit(float(total_tokens)) / F.lit(int(n_docs))

    hits = toks.where(F.col("term").isin(terms))
    tf = (hits.groupBy("_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_t = (tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df")))
    idf = F.log(F.lit(1.0)
                + (F.lit(int(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    lk1, lb = F.lit(float(k1)), F.lit(float(b))
    score = (idf * (F.col("tf") * (lk1 + F.lit(1.0)))
             / (F.col("tf")
                + lk1 * (F.lit(1.0) - lb + lb * F.col("dl") / avgdl)))
    s7 = F.round(score * F.lit(1e7), 0).cast("long")
    return (tf.join(F.broadcast(df_t), "term")
            .join(dl, "_id")
            .withColumn("s7", s7)
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_match_terms"),
                 F.sum("s7").alias("score7"))
            .select(F.col("_id").alias(id_col), "n_match_terms", "score7")
            .orderBy(F.desc("score7"), id_col)
            .limit(k))
