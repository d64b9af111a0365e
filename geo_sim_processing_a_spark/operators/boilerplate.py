"""Line-level boilerplate removal (CCNet-style) for web-text curation.

Crawled pages carry template lines — navigation bars, cookie banners,
copyright footers — that repeat verbatim across many documents of a
site.  The standard curation move (Wenzek et al. 2020, CCNet) is to
hash every line, count how many *distinct documents* each normalized
line appears in, and strip lines above a document-frequency threshold
before dedup/quality scoring.

Spark shape (all JVM-side, UDF-free):

  1. ``posexplode(split(text, '\\n'))`` — line granularity, pipelined
     into the scan stage (no shuffle).
  2. one hash-aggregate on the normalized line key with a partial
     (map-side) ``count(distinct doc)`` — the only full shuffle.
  3. the boilerplate set (lines with doc-frequency >= min_docs) is by
     construction small — template lines concentrate — so the removal
     join is a **broadcast left-anti join** at line granularity (no
     second line-level shuffle).
  4. re-assembly groups kept lines per document (second shuffle, at
     document granularity) and rebuilds the text with
     ``array_sort(collect_list(struct(pos, line)))`` — deterministic
     original order.

At 100 TB the line-key aggregate is the cost driver; it partial-
aggregates map-side and its key space shrinks as template lines
collapse.  The broadcast of the over-threshold set is bounded by
min_docs: raising the threshold shrinks it (at web scale: per-domain
thresholds keep it tiny).  ``broadcast_boiler=False`` falls back to a
shuffle anti-join when a caller picks a threshold so low the set no
longer fits a broadcast.

The testdata documents are single-line word soup, so the driver query
synthesizes a deterministic multi-line page per doc (header / source
nav / 12-token content lines / footer) identically in Spark and in the
DuckDB oracle — same pattern as operators/urls.synth_messy_urls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADER_LINE = "home | about | contact"
FOOTER_LINE = "(c) example corp - all rights reserved"
TOKENS_PER_LINE = 12


def synth_pages_with_boilerplate(docs: DataFrame, id_col: str = "doc_id",
                                 text_col: str = "text",
                                 source_col: str = "source") -> DataFrame:
    """Deterministic multi-line page per document: a global header, a
    per-source nav line, the doc text re-wrapped at TOKENS_PER_LINE
    tokens per line, and a global footer.  Mirrored verbatim in the
    DuckDB oracle (driver_queries.SQL_BOILERPLATE)."""
    from .text import wrap_token_lines
    content = wrap_token_lines(F.col(text_col), TOKENS_PER_LINE)
    lines = F.concat(
        F.array(F.lit(HEADER_LINE),
                F.concat(F.lit("section: "), F.col(source_col))),
        content,
        F.array(F.lit(FOOTER_LINE)))
    return docs.withColumn("page", F.array_join(lines, "\n"))


def _lines(pages: DataFrame, id_col: str, page_col: str) -> DataFrame:
    """(doc, pos, line, key) at line granularity — scan-stage explode."""
    return (pages
            .select(id_col, F.posexplode(F.split(F.col(page_col), "\n"))
                    .alias("pos", "line"))
            .withColumn("key", F.lower(F.trim(F.col("line")))))


def line_doc_frequency(pages: DataFrame, id_col: str = "doc_id",
                       page_col: str = "page") -> DataFrame:
    """Distinct-document frequency per normalized line: (key, n_docs).
    One hash-aggregate shuffle with map-side partials."""
    return (_lines(pages, id_col, page_col)
            .groupBy("key")
            .agg(F.countDistinct(id_col).alias("n_docs")))


def boilerplate_keys(pages: DataFrame, min_docs: int = 5,
                     id_col: str = "doc_id",
                     page_col: str = "page") -> DataFrame:
    """The boilerplate set itself: normalized line keys whose
    document frequency is >= min_docs, as a one-column ("key")
    DataFrame.  In production this runs over a REFERENCE corpus (or a
    deterministic sample) once, and the result is reused across
    batches / streaming micro-batches — per-micro-batch frequencies
    would see too few documents to cross any sensible threshold."""
    return (line_doc_frequency(pages, id_col, page_col)
            .filter(F.col("n_docs") >= F.lit(min_docs))
            .select("key"))


def strip_lines(pages: DataFrame, boiler: DataFrame,
                id_col: str = "doc_id", page_col: str = "page",
                broadcast_boiler: bool = True) -> DataFrame:
    """Strip every line whose normalized form appears in ``boiler``
    (a one-column "key" frame, e.g. from boilerplate_keys over a
    reference corpus).  Stateless given the boilerplate set — safe in
    foreachBatch / streaming.  Returns one row per input document:

      (id_col, n_lines, n_dropped, text_clean)

    text_clean preserves the original order of the kept lines; a
    document whose every line is boilerplate comes back with
    text_clean = '' (LEFT join + coalesce, no row loss)."""
    keyed = _lines(pages, id_col, page_col)
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    kept = keyed.join(boiler, "key", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda x: x["line"]), "\n").alias("text_clean"))
    base = pages.select(
        id_col, F.size(F.split(F.col(page_col), "\n")).alias("n_lines"))
    return (base.join(rebuilt, id_col, "left")
            .select(id_col, "n_lines",
                    (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
                    .alias("n_dropped"),
                    F.coalesce(F.col("text_clean"), F.lit(""))
                    .alias("text_clean")))


def remove_boilerplate(pages: DataFrame, min_docs: int = 5,
                       id_col: str = "doc_id", page_col: str = "page",
                       broadcast_boiler: bool = True) -> DataFrame:
    """Self-referential convenience: boilerplate_keys over ``pages``
    itself, then strip_lines.  A BATCH operator — the frequency count
    needs the whole corpus; for streaming, compute boilerplate_keys
    over a reference corpus once and call strip_lines per batch."""
    boiler = boilerplate_keys(pages, min_docs, id_col, page_col)
    return strip_lines(pages, boiler, id_col, page_col, broadcast_boiler)
