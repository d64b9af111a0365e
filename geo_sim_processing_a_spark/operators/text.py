"""Text-analysis operators for training-data pipelines (task brief):
language ID (stopword-vote heuristic), quality scoring, token counting,
document fingerprinting.  Every operator is a plain Spark-SQL column
expression (JVM-side, whole-stage codegen — UDF-free) and each has an
ANSI-SQL twin in __spark_entry__.oracle_sql for the DuckDB check."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (heuristic language ID)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
    "pt": ["de", "para", "uma"],
}


def _marker_hits(col: Column, words: list) -> Column:
    """Count of marker-word occurrences (space-delimited match)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    expr = F.lit(0)
    for w in words:
        hay = F.concat(F.lit(" "), F.lit(w), F.lit(" "))
        # occurrences = (len(s) - len(replace(s, w, ''))) / len(w)
        expr = expr + (F.length(padded) - F.length(F.replace(padded, hay, F.lit(" ")))) \
            / F.length(hay)
    return expr.cast("int")


def lang_id(col: Column) -> Column:
    """Argmax of marker hits; 'und' when nothing matched. Deterministic
    tie-break by language-key order."""
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        score = _marker_hits(col, LANG_MARKERS[lang])
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def token_count(col: Column) -> Column:
    """Whitespace token count (size of split on whitespace runs)."""
    return F.size(F.split(F.trim(col), r"\s+"))


def word_token_count(col: Column) -> Column:
    """BPE-ish token proxy: count of word/number/punct units."""
    return F.size(F.split(F.trim(F.regexp_replace(col, r"([^\w\s])", r" $1 ")), r"\s+"))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[\w\s]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


def mean_word_len(col: Column) -> Column:
    no_space = F.regexp_replace(col, r"\s", "")
    return F.length(no_space) / F.greatest(token_count(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """[0,1] quality heuristic: length band + punctuation + word-length
    sanity.  Same arithmetic is written in the SQL oracle."""
    n = F.length(col)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    wl = mean_word_len(col)
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * 0.5 + (1.0 - punct_pen) * 0.25 + wl_score * 0.25, 6)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased
    text (stable across layout changes; md5 exists in both engines)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return (docs
            .withColumn("lang_pred", lang_id(c))
            .withColumn("n_tokens", token_count(c))
            .withColumn("quality", quality_score(c))
            .withColumn("fp", fingerprint(c)))
