"""C4 heuristic cleaning battery (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) — the line- and page-level rules
the C4 corpus was built with, re-expressed as pure Spark-SQL column
expressions (JVM-side, whole-stage codegen, zero UDF, zero shuffle
before the ordered output):

  line rules (a line survives iff ALL hold):
    L1  ends with a terminal punctuation mark  (. ! ? ")
    L2  has at least MIN_LINE_WORDS (5) words
    L3  does not contain the word 'javascript' (case-insensitive)

  page rules (on the ORIGINAL page + the line-filtered rebuild):
    P1  at least 3 sentences survive the line filter
        (sentence := terminal-punct occurrence in the kept text)
    P2  page does not contain 'lorem ipsum'
    P3  page does not contain a curly brace '{'
    P4  page contains no bad-list word (word-delimited match)

The three-sentence-span dedup the paper also applies is covered by
operators/spans.py (ExactSubstr) — composing the two reproduces the
full C4 pipeline.

The testdata documents are single-line word soup, so q_c4_filters
synthesizes a deterministic multi-line page per doc (nav header /
punctuated + unpunctuated content lines / residue-gated javascript,
lorem-ipsum, brace and bad-word lines / footer) identically in Spark
and in the DuckDB oracle — same pattern as boilerplate's page synth.

Scale shape: every rule is a scalar projection over one row — the
operator pipelines inside the parquet scan stage at any corpus size.
Cross-engine regex discipline per round-5 fuzzing: explicit
whitespace class, \\z not $, no \\b / lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WS_CLASS

MIN_LINE_WORDS = 5
MIN_SENTENCES = 3
# word-delimited, lowercase; placeholder list (the production list is
# the usual blocklist — swap in via the bad_words parameter)
C4_BAD_WORDS = ("badword", "obscene", "nsfw")

TERMINAL_RE = '[.!?"]' + WS_CLASS + r"*\z"


def _line_keep(line):
    """Column predicate: does one line survive the C4 line rules."""
    words = F.filter(F.split(line, WS_CLASS + "+"), lambda x: x != "")
    return (line.rlike(TERMINAL_RE)
            & (F.size(words) >= F.lit(MIN_LINE_WORDS))
            & ~F.lower(line).contains("javascript"))


def with_c4_rules(pages: DataFrame, page_col: str = "page",
                  bad_words: tuple = C4_BAD_WORDS) -> DataFrame:
    """Adds n_lines / n_kept / n_sentences / has_lorem / has_brace /
    has_badword / c4_pass / text_c4 (the line-filtered rebuild).
    NULL page is treated as empty (fails P1 deterministically)."""
    p = F.coalesce(F.col(page_col), F.lit(""))
    lines = F.split(p, r"\n")
    kept = F.filter(lines, _line_keep)
    text_c4 = F.array_join(kept, "\n")
    low = F.lower(p)
    n_sent = F.regexp_count(text_c4, F.lit("[.!?]"))
    # non-alphanumeric delimiters (not just whitespace): 'badword.' and
    # '(nsfw)' must match — the paper drops the page on ANY occurrence
    bad = sum((F.when(low.rlike(f"(^|[^a-z0-9]){w}([^a-z0-9]|\\z)"), 1)
               .otherwise(0) for w in bad_words), F.lit(0))
    out = (pages
           .withColumn("n_lines", F.size(lines).cast("long"))
           .withColumn("n_kept", F.size(kept).cast("long"))
           .withColumn("n_sentences", n_sent.cast("long"))
           .withColumn("has_lorem", low.contains("lorem ipsum"))
           .withColumn("has_brace", p.contains("{"))
           .withColumn("has_badword", bad > 0)
           .withColumn("text_c4", text_c4))
    return out.withColumn(
        "c4_pass",
        (F.col("n_sentences") >= MIN_SENTENCES)
        & ~F.col("has_lorem") & ~F.col("has_brace")
        & ~F.col("has_badword"))


# ----- deterministic page synth for the oracle-twinned driver query -----

NAV_LINE = "home | about | contact"          # no terminal punct -> dropped
FOOTER_LINE = "all rights reserved example corp"  # no terminal punct
JS_LINE = "please enable javascript to view this site."   # L3 drop
LOREM_LINE = "lorem ipsum dolor sit amet consectetur."    # P2 page drop
BRACE_LINE = "if (x) { return window.location; }"          # P3 page drop
BAD_LINE = "this page contains badword material inside."   # P4 page drop
TOKENS_PER_LINE = 12


def synth_c4_pages(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Deterministic multi-line page per document exercising every C4
    rule: nav header, doc text re-wrapped at TOKENS_PER_LINE tokens
    with a '.' appended to lines where (line_idx % 3 != 2) (the rest
    stay unpunctuated -> L1 drops), residue-gated special lines
    (doc_id%7 -> javascript, %11 -> lorem ipsum, %13 -> brace,
    %17 -> bad word), and an unpunctuated footer.  Mirrored verbatim
    in the DuckDB oracle (driver_queries.SQL_C4)."""
    from .text import wrap_token_lines
    content = wrap_token_lines(
        F.col(text_col), TOKENS_PER_LINE,
        line_suffix=lambda i: F.when(i % 3 != 2, F.lit("."))
                               .otherwise(F.lit("")))
    did = F.col(id_col)

    def gated(res, line):
        return F.when(did % res == 0, F.array(F.lit(line))) \
                .otherwise(F.array().cast("array<string>"))

    lines = F.concat(
        F.array(F.lit(NAV_LINE)),
        content,
        gated(7, JS_LINE),
        gated(11, LOREM_LINE),
        gated(13, BRACE_LINE),
        gated(17, BAD_LINE),
        F.array(F.lit(FOOTER_LINE)))
    return docs.withColumn("page", F.array_join(lines, "\n"))
