"""Composed web-curation pipeline (curation.curate_web_corpus)."""

from pyspark.sql import functions as F

from geo_sim_processing_a_spark.operators.curation import curate_web_corpus


def _docs(spark, n=120):
    # docs 100/101 duplicate doc 0's text -> dedup candidates; all texts
    # are long enough to clear the token floor after page synthesis
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu ")
    rows = []
    for i in range(n):
        text = base + f"doc {i} " + " ".join(f"w{i}t{j}" for j in range(10))
        if i in (100, 101):
            text = base + "doc 0 " + " ".join(f"w0t{j}" for j in range(10))
        rows.append((i, text, f"s{i % 4}"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_web_corpus_stages_bind(spark):
    out = curate_web_corpus(_docs(spark), cap_per_domain=10).collect()
    by_id = {r["doc_id"]: r for r in out}
    # boilerplate: header + per-source nav + footer dropped everywhere
    assert all(r["n_dropped"] >= 3 for r in out)
    # split values valid and deterministic
    assert {r["split"] for r in out} <= {"train", "valid", "test"}
    # domain cap binds
    counts = {}
    for r in out:
        counts[r["domain"]] = counts.get(r["domain"], 0) + 1
    assert max(counts.values()) <= 10
    # survivors carry sane stats
    assert all(r["n_tokens"] >= 20 for r in out)
    assert all(0.0 <= r["top_share"] <= 0.12 for r in out)
    assert by_id  # non-empty


def test_curate_web_corpus_rerun_deterministic(spark):
    """Two independent runs over the same input produce identical rows
    (content-addressed split + min-id dedup + deterministic synth —
    nothing in the pipeline may depend on partitioning or run order).
    Dedup-collapse itself is asserted by
    test_curate_web_corpus_exact_dup_pages_collapse below."""
    out = curate_web_corpus(_docs(spark), cap_per_domain=120).collect()
    out2 = curate_web_corpus(_docs(spark), cap_per_domain=120).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    assert out  # pipeline returns rows


def test_curate_web_corpus_forwards_column_names(spark):
    """Non-default id/text/source column names must flow through every
    sub-operator (review r5: the parameters were accepted but not
    forwarded, so any non-default name crashed)."""
    d = _docs(spark, n=40)
    renamed = (d.withColumnRenamed("doc_id", "page_id")
               .withColumnRenamed("text", "body")
               .withColumnRenamed("source", "site"))
    out = curate_web_corpus(renamed, id_col="page_id", text_col="body",
                            source_col="site", cap_per_domain=40).collect()
    expect = curate_web_corpus(d, cap_per_domain=40).collect()
    assert sorted((r["page_id"],) + tuple(r)[1:] for r in out) \
        == sorted(map(tuple, expect))


def test_curate_web_corpus_exact_dup_pages_collapse(spark):
    """Two docs with identical doc-derived synthesis CANNOT both
    survive: force it by giving the duplicate the same doc_id-parity
    synth inputs — here we instead verify collapse via a direct
    construction: same text AND same synthesized extras happens when
    md5('p'||id) digit bands coincide; find such a pair dynamically and
    assert only the min id survived."""
    import hashlib

    def digits(i):
        h = hashlib.md5(f"p{i}".encode()).hexdigest()
        u = hashlib.md5(f"u{i}".encode()).hexdigest()
        return (h[0] < "8", h[1] < "8", h[2] < "6",
                "a" if h[3] < "4" else ("b" if h[3] < "8" else "c"),
                h[4] < "4",
                # URL synth digits that decide the domain
                u[1] < "4", "com" if u[2] < "8" else ("couk" if u[2] < "c"
                                                      else "org"))

    # find two ids with identical synth bands AND identical phone/ip
    # arithmetic residues: then identical text -> identical redacted page
    pair = None
    for a in range(400):
        for b in range(a + 1, 400):
            if digits(a) == digits(b) and not digits(a)[0] \
               and not digits(a)[2] and digits(a)[3] == "c":
                # no email, no ip, no phone planted -> extras equal
                pair = (a, b)
                break
        if pair:
            break
    assert pair, "no synth-identical pair in range"
    a, b = pair
    # diverse tokens: the repetition (top_share) rule must NOT trip
    shared = " ".join(f"shared{j}" for j in range(40))
    rows = [(a, shared, "sX"), (b, shared, "sX")]
    # pad with distinct docs so boilerplate lines reach min_docs
    rows += [(1000 + i,
              " ".join(f"fill{i}x{j}" for j in range(40)), "sX")
             for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_web_corpus(df, min_tokens=5, cap_per_domain=100).collect()
    ids = {r["doc_id"] for r in out}
    assert a in ids and b not in ids  # min-id survivor only


def test_curate_job_cli_web_mode(spark, tmp_path, monkeypatch):
    """--web drives curate_web_pages from argv over a table with real
    (doc_id, url, page) columns and writes a split-partitioned table
    matching its printed stats."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    from geo_sim_processing_a_spark.operators.boilerplate import (
        synth_pages_with_boilerplate)
    from geo_sim_processing_a_spark.operators.urls import synth_messy_urls
    from jobs import curate_job

    src = str(tmp_path / "webdocs")
    raw = synth_pages_with_boilerplate(synth_messy_urls(_docs(spark)))
    raw.select("doc_id", "url", "page").write.parquet(src)

    out = str(tmp_path / "curated_web")
    monkeypatch.setattr(sys, "argv", [
        "curate_job.py", "--docs-path", src, "--out", out,
        "--web", "--url-col", "url", "--text-col", "page",
        "--min-tokens", "5", "--cap-per-domain", "50"])
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    buf = io.StringIO()
    with redirect_stdout(buf):
        curate_job.main()
    line = [l for l in buf.getvalue().splitlines()
            if l.startswith("CURATE_STATS ")][0]
    stats = json.loads(line[len("CURATE_STATS "):])
    assert stats["docs_in"] == 120
    assert 0 < stats["docs_out"] <= 120
    back = spark.read.parquet(out)
    assert back.count() == stats["docs_out"] == sum(stats["splits"].values())
    assert {"domain", "n_dropped", "n_tokens"} <= set(back.columns)


def test_curate_web_pages_with_reference_boiler_keys(spark):
    """Passing a precomputed boilerplate set (reference corpus) gives
    the same result as computing it over the corpus itself when the
    reference IS the corpus — the streaming/incremental shape."""
    from geo_sim_processing_a_spark.operators.boilerplate import (
        boilerplate_keys, synth_pages_with_boilerplate)
    from geo_sim_processing_a_spark.operators.curation import (
        curate_web_pages)
    from geo_sim_processing_a_spark.operators.urls import synth_messy_urls

    raw = synth_pages_with_boilerplate(synth_messy_urls(_docs(spark)))
    keys = boilerplate_keys(raw, min_docs=5)
    # min_tokens=5: every doc's shared 26-word prefix wraps into
    # identical content lines that the frequency filter (correctly)
    # strips as boilerplate, leaving only the short unique tail
    a = curate_web_pages(raw, cap_per_domain=50, min_tokens=5).collect()
    b = curate_web_pages(raw, cap_per_domain=50, min_tokens=5,
                         boiler_keys=keys).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a
