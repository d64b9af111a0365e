"""PII detection and redaction for web-text curation — emails, IPv4
addresses and phone numbers, the three shapes every public crawl
pipeline screens before training (e.g. the C4 / RefinedWeb / Dolma
cleanup recipes).

All columns are JVM-side regex expressions (whole-stage codegen, zero
UDF, zero shuffle) and each has a DuckDB twin in
__spark_entry__.oracle_sql.  Cross-engine regex discipline (round-5
fuzzing lessons, see operators/urls.normalize_url): patterns use ONLY
constructs with identical semantics in Java regex (Spark) and RE2
(DuckDB) — no ``\\b`` (unicode-dependent), no lookaround (RE2 lacks
it), no ``$`` / ``\\s`` / ``.``; character classes are explicit and
anchoring is structural (the pattern consumes what it matches).  Both
engines use leftmost-first alternation and greedy bounded repetition,
so match sets are engine-identical on any input.

Detection is shape-based by design (a crawl screen, not a validator):
``999.999.999.999`` counts as an IPv4 hit — both engines agree, and
over-matching is the safe direction for a redaction pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One pattern per PII class, shared verbatim with the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"[0-9]{1,3}(\.[0-9]{1,3}){3}"
# phone requires a structural prefix (+CC / (area) ) so bare number
# runs and dates never match
PHONE_RE = r"(\+[0-9]{1,2} [0-9]{3}-|\([0-9]{3}\) )[0-9]{3}-[0-9]{4}"

REDACTIONS = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def _count(col: Column, pattern: str) -> Column:
    # group 0 = whole match; Spark's regexp_extract_all defaults to
    # group 1, DuckDB's to group 0 — pass 0 explicitly on the Spark
    # side so both engines count whole-pattern matches
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def with_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_emails / n_ipv4 / n_phones / has_pii.  Counts are over
    the ORIGINAL text, independent of redaction order."""
    c = F.col(text_col)
    out = (docs
           .withColumn("n_emails", _count(c, EMAIL_RE))
           .withColumn("n_ipv4", _count(c, IPV4_RE))
           .withColumn("n_phones", _count(c, PHONE_RE)))
    return out.withColumn(
        "has_pii",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")) > 0)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds text_redacted: emails, then IPv4, then phones replaced with
    typed placeholders.  Order is fixed and mirrored in the oracle (an
    IPv4 inside an already-redacted email is gone by step 2 — both
    engines resolve overlaps identically)."""
    x = F.col(text_col)
    for pattern, token in REDACTIONS:
        x = F.regexp_replace(x, pattern, token)
    return docs.withColumn("text_redacted", x)


def synth_pii_text(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   source_col: str = "source") -> DataFrame:
    """Deterministic PII-bearing column derived from (doc_id, source) —
    the testdata carries no PII, so the driver demo plants emails, IPs
    and phones (and near-miss negatives: a 3-octet version string that
    must NOT match) from md5 digits + doc_id arithmetic, identically in
    Spark and in the DuckDB oracle."""
    h = F.md5(F.concat(F.lit("p"), F.col(id_col).cast("string"))
              .cast("binary"))

    def d(i: int):
        return F.substring(h, i, 1)

    sid = F.col(id_col)
    email = F.when(
        d(1) < "8",
        F.concat(F.lit(" contact "), F.col(source_col), F.lit("."),
                 F.substring(h, 9, 2), F.lit("@mail-"), F.col(source_col),
                 F.when(d(2) < "8", F.lit(".com")).otherwise(F.lit(".org"))
                 )).otherwise(F.lit(""))
    ip = F.when(
        d(3) < "6",
        F.concat(F.lit(" server 10."), (sid % 256).cast("string"),
                 F.lit("."), ((sid * 7) % 256).cast("string"),
                 F.lit("."), ((sid * 13) % 256).cast("string"))
        ).otherwise(F.lit(""))
    phone = (F.when(
        d(4) < "4",
        F.concat(F.lit(" call +1 555-"),
                 F.lpad((sid % 1000).cast("string"), 3, "0"),
                 F.lit("-"),
                 F.lpad(((sid * 3) % 10000).cast("string"), 4, "0")))
        .when(
        d(4) < "8",
        F.concat(F.lit(" tel (555) "),
                 F.lpad((sid % 1000).cast("string"), 3, "0"),
                 F.lit("-"),
                 F.lpad(((sid * 9) % 10000).cast("string"), 4, "0")))
        .otherwise(F.lit("")))
    negative = F.when(d(5) < "4", F.lit(" v10.2.33 build")) \
                .otherwise(F.lit(""))
    return docs.withColumn(
        "pii_text", F.concat(F.col(text_col), email, ip, phone, negative))
