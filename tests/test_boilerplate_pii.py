"""Line-level boilerplate removal + PII detection/redaction
(operators/boilerplate.py, operators/pii.py)."""

import duckdb
import pandas as pd
import pytest

from geo_sim_processing_a_spark.operators.boilerplate import (
    line_doc_frequency, remove_boilerplate, synth_pages_with_boilerplate)
from geo_sim_processing_a_spark.operators.pii import (
    EMAIL_RE, IPV4_RE, PHONE_RE, redact_pii, synth_pii_text, with_pii)


def _pages(spark):
    # 6 docs share FOOTER; docs 0-4 also share NAV; doc 5 is nothing
    # but boilerplate; content lines are unique per doc
    rows = []
    for i in range(5):
        rows.append((i, f"unique content line {i}\nNAV | bar\nFOOTER 2024"))
    rows.append((5, "NAV | bar\nFOOTER 2024"))
    return spark.createDataFrame(rows, "doc_id long, page string")


def test_remove_boilerplate_drops_frequent_lines(spark):
    out = {r["doc_id"]: r for r in
           remove_boilerplate(_pages(spark), min_docs=5).collect()}
    assert len(out) == 6          # no row loss, even the all-boiler doc
    for i in range(5):
        assert out[i]["text_clean"] == f"unique content line {i}"
        assert out[i]["n_lines"] == 3 and out[i]["n_dropped"] == 2
    assert out[5]["text_clean"] == "" and out[5]["n_dropped"] == 2


def test_remove_boilerplate_preserves_order(spark):
    # two kept lines sandwiching a dropped one must keep their order
    rows = [(i, f"alpha {i}\nCOMMON\nzulu {i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, page string")
    out = {r["doc_id"]: r["text_clean"]
           for r in remove_boilerplate(df, min_docs=5).collect()}
    assert out[0] == "alpha 0\nzulu 0"


def test_remove_boilerplate_shuffle_join_parity(spark):
    a = remove_boilerplate(_pages(spark), min_docs=5,
                           broadcast_boiler=True).collect()
    b = remove_boilerplate(_pages(spark), min_docs=5,
                           broadcast_boiler=False).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_line_doc_frequency_counts_distinct_docs(spark):
    # a line repeated INSIDE one doc counts that doc once
    df = spark.createDataFrame(
        [(0, "dup\ndup\nx"), (1, "dup\ny")], "doc_id long, page string")
    freq = {r["key"]: r["n_docs"]
            for r in line_doc_frequency(df).collect()}
    assert freq["dup"] == 2 and freq["x"] == 1


def test_boilerplate_normalization_case_and_pad(spark):
    # ' Footer ' and 'footer' normalize to the same key
    rows = [(i, f"line {i}\n Footer ") for i in range(4)] + [(4, "a\nfooter")]
    df = spark.createDataFrame(rows, "doc_id long, page string")
    out = {r["doc_id"]: r["n_dropped"]
           for r in remove_boilerplate(df, min_docs=5).collect()}
    assert all(v == 1 for v in out.values())


def test_pii_detection_and_negatives(spark):
    rows = [
        (0, "reach me at john.doe+x@sub.example.co.uk today"),   # email
        (1, "server 10.0.255.7 and also 999.999.999.999"),       # 2 ips
        (2, "call +1 555-123-4567 or tel (555) 987-6543"),       # 2 phones
        (3, "version v10.2.33 build and date 555-1234"),         # negatives
        (4, "ip-ish 1.2.3.4.5 chain"),                           # one match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_pii(df).collect()}
    assert (out[0]["n_emails"], out[0]["n_ipv4"], out[0]["n_phones"]) == (1, 0, 0)
    assert out[1]["n_ipv4"] == 2
    assert out[2]["n_phones"] == 2
    assert not out[3]["has_pii"]
    assert out[4]["n_ipv4"] == 1   # leftmost-first: 1.2.3.4 matches


def test_pii_redaction_order_and_tokens(spark):
    df = spark.createDataFrame(
        [(0, "a@b.io then 1.2.3.4 then +1 555-000-1111 end")],
        "doc_id long, text string")
    got = redact_pii(df).collect()[0]["text_redacted"]
    assert got == "<EMAIL> then <IP> then <PHONE> end"


FUZZ_INPUTS = [
    "",
    "a@b.co\n",                       # trailing newline ($-trap guard)
    "x\n1.2.3.4\ny",
    "a@b.c",                          # TLD too short -> no email
    "A@B.COM\x0bc@d.org",             # \x0b between matches
    "..@..com",
    "1.2.3.4.5.6",
    "255.255.255.255",
    "+12 345-678-9012",               # wrong grouping -> no phone
    "+1 555-123-4567\n(555) 111-2222",
    "mail: u%x_y-1@h-o.st.info.",
    "é@exámple.com",                  # non-ASCII local part
    "123@456.789",                    # digits-only TLD -> no email
    "call+1 555-123-4567",            # glued prefix still matches pattern
    "(55) 123-4567 (555)123-4567",    # malformed area codes
    "10.2.33 v10.2.33.44 build",
]


def test_pii_cross_engine_fuzz(spark):
    """Spark (Java regex) and DuckDB (RE2) agree on counts AND on the
    redacted string for every adversarial input — the committed
    regression gate for the cross-engine regex discipline."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FUZZ_INPUTS)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["n_phones"],
                         r["text_redacted"])
           for r in redact_pii(with_pii(df)).collect()}
    con = duckdb.connect()
    for i, s in enumerate(FUZZ_INPUTS):
        row = con.execute(
            f"""SELECT len(regexp_extract_all(?, '{EMAIL_RE}')),
                       len(regexp_extract_all(?, '{IPV4_RE}')),
                       len(regexp_extract_all(?, '{PHONE_RE}')),
                       regexp_replace(regexp_replace(regexp_replace(?,
                         '{EMAIL_RE}', '<EMAIL>', 'g'),
                         '{IPV4_RE}', '<IP>', 'g'),
                         '{PHONE_RE}', '<PHONE>', 'g')""",
            [s, s, s, s]).fetchone()
        assert got[i] == tuple(row), (i, s, got[i], row)


def test_synth_pii_deterministic_and_planted(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", f"s{i % 3}") for i in range(64)],
        "doc_id long, text string, source string")
    out = with_pii(synth_pii_text(docs), text_col="pii_text")
    rows = out.collect()
    assert rows == out.collect()            # deterministic
    total = sum(r["n_emails"] + r["n_ipv4"] + r["n_phones"] for r in rows)
    assert total > 30                       # plants actually land
    # the 3-octet negative never creates an IPv4 hit by itself
    neg_only = [r for r in rows if "v10.2.33" in r["pii_text"]
                and " server " not in r["pii_text"]]
    assert neg_only and all(r["n_ipv4"] == 0 for r in neg_only)


def test_pii_columns_on_stream(spark, tmp_path):
    """PII columns are stateless projections — identical outputs on
    Structured Streaming (ingest-time screening composes with batch)."""
    src = str(tmp_path / "pii_in")
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(60),
                      "source": [f"s{i % 5}" for i in range(60)],
                      "text": [f"body {i}" for i in range(60)]}),
        "doc_id long, source string, text string")
    docs.repartition(2).write.parquet(src)
    stream = (spark.readStream
              .schema("doc_id long, source string, text string").parquet(src))

    def cols(df):
        return (redact_pii(with_pii(synth_pii_text(df), text_col="pii_text"),
                           text_col="pii_text")
                .select("doc_id", "n_emails", "n_ipv4", "n_phones",
                        "text_redacted"))

    q = (cols(stream).writeStream.format("memory").queryName("pii5")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["doc_id"]: tuple(r)[1:]
           for r in spark.sql("select * from pii5").collect()}
    expect = {r["doc_id"]: tuple(r)[1:] for r in cols(docs).collect()}
    assert got == expect and len(got) == 60


def test_synth_pages_wraps_tokens(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(30)), "s0")],
        "doc_id long, text string, source string")
    page = synth_pages_with_boilerplate(docs).collect()[0]["page"]
    lines = page.split("\n")
    # header + nav + ceil(30/12)=3 content + footer
    assert len(lines) == 6
    assert lines[0] == "home | about | contact"
    assert lines[1] == "section: s0"
    assert lines[2].split(" ") == [f"w{i}" for i in range(12)]
    assert lines[4] == "w24 w25 w26 w27 w28 w29"
    assert lines[5].startswith("(c) example corp")


def test_strip_lines_with_reference_corpus_on_stream(spark, tmp_path):
    """The production/streaming shape: boilerplate_keys computed once
    over a REFERENCE corpus, strip_lines applied per micro-batch —
    stateless given the set, identical to the batch result."""
    from geo_sim_processing_a_spark.operators.boilerplate import (
        boilerplate_keys, strip_lines)

    ref = _pages(spark)                       # reference corpus
    boiler = boilerplate_keys(ref, min_docs=5)
    src = str(tmp_path / "bp_in")
    ref.repartition(2).write.parquet(src)

    stream = (spark.readStream
              .schema("doc_id long, page string").parquet(src))
    batch_out = {}

    def sink(df, _epoch):
        for r in strip_lines(df, boiler).collect():
            batch_out[r["doc_id"]] = (r["n_lines"], r["n_dropped"],
                                      r["text_clean"])

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    expect = {r["doc_id"]: (r["n_lines"], r["n_dropped"], r["text_clean"])
              for r in strip_lines(ref, boiler).collect()}
    assert batch_out == expect and len(batch_out) == 6
