"""Structured Streaming ingestion: windowed counts with watermark and
the incremental foreachBatch tile pipeline (exactly-once per tile via
the manifest)."""

from pyspark.sql import functions as F

from geo_sim_processing_a_spark.sources.spark_pages import build_pages
from geo_sim_processing_a_spark.streaming.ingest import (
    run_incremental_pipeline, stream_pages, windowed_page_counts)


def test_windowed_counts_availablenow(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    build_pages(spark, 200, partitions=2).write.parquet(src)
    out = windowed_page_counts(stream_pages(spark, src))
    q = (out.writeStream.format("memory").queryName("wc")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("select sum(n_pages) as total from wc").collect()
    # append mode only emits windows the watermark has passed; with one
    # batch nothing may finalize — assert the query ran and the
    # complete-mode variant accounts for every page
    q2 = (windowed_page_counts(stream_pages(spark, src))
          .writeStream.format("memory").queryName("wc2")
          .outputMode("complete").trigger(availableNow=True).start())
    q2.awaitTermination()
    total = spark.sql("select sum(n_pages) as t from wc2").collect()[0]["t"]
    assert total == 200


def test_incremental_pipeline(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    build_pages(spark, 120, partitions=2).write.parquet(src)
    run_incremental_pipeline(spark, src, out, ckpt)
    data = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    assert data.count() > 0
    mf = spark.read.parquet(f"{out}/_manifest")
    assert mf.count() > 0
    # second drop of files -> only new batch processed, old untouched
    build_pages(spark, 240, partitions=2).where(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") >= 120
    ).write.mode("append").parquet(src)
    run_incremental_pipeline(spark, src, out, ckpt)
    data2 = spark.read.option("basePath", f"{out}/data").parquet(f"{out}/data")
    assert data2.count() > data.count()


def test_stateful_cell_counts_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-cell running totals accumulate
    across micro-batches AND survive a query restart via the state
    store in the checkpoint."""
    from geo_sim_processing_a_spark.streaming.ingest import stateful_cell_counts

    src = str(tmp_path / "pages_state")
    ckpt = str(tmp_path / "state_ckpt")
    sink = str(tmp_path / "state_out")
    build_pages(spark, 100, partitions=2).write.parquet(src)

    def drain():
        # foreachBatch file sink: the memory sink cannot recover from a
        # checkpoint, and recovery is exactly what this test exercises
        def write_batch(df, batch_id):
            df.write.mode("append").parquet(sink)

        q = (stateful_cell_counts(stream_pages(spark, src), res=2)
             .writeStream.foreachBatch(write_batch)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    def latest_per_cell():
        rows = spark.read.parquet(sink).collect()
        out = {}
        for r in rows:  # running totals are monotone; keep the max
            cur = out.get(r["cell"])
            if cur is None or r["n_pages"] > cur[0]:
                out[r["cell"]] = (r["n_pages"], r["n_batches"])
        return out

    drain()
    first = latest_per_cell()
    assert sum(n for n, _ in first.values()) == 100

    # second drop (doc ids 100..249 = 150 new pages), NEW query
    # instance, same checkpoint -> state resumes
    build_pages(spark, 250, partitions=2).where(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") >= 100
    ).write.mode("append").parquet(src)
    drain()
    second = latest_per_cell()
    # updated cells carry the RUNNING total (old + new), not a reset
    assert sum(n for n, _ in second.values()) == 250
    grew = [c for c in second if c in first and second[c][0] > first[c][0]]
    assert grew, "no cell accumulated across the restart"
    for c in grew:
        assert second[c][1] > first[c][1]  # batch counter advanced too


def test_sessionized_counts(spark, tmp_path):
    from geo_sim_processing_a_spark.streaming.ingest import (
        sessionized_page_counts, stream_pages)
    src = str(tmp_path / "pages_sess")
    build_pages(spark, 150, partitions=2).write.parquet(src)
    q = (sessionized_page_counts(stream_pages(spark, src), gap="6 hours")
         .writeStream.format("memory").queryName("sess")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("select * from sess").collect()
    assert sum(r["n_pages"] for r in rows) == 150
    for r in rows:
        assert r["session_end"] > r["session_start"]


def test_dedup_pages_stream(spark, tmp_path):
    """Streaming exact dedup: duplicated texts within the watermark
    horizon collapse to one row; state is watermark-bounded."""
    import pandas as pd
    from geo_sim_processing_a_spark.streaming.ingest import dedup_pages_stream

    src = str(tmp_path / "pages_dup")
    base = build_pages(spark, 60, partitions=2).toPandas()
    dup = base.copy()
    dup["url"] = dup["url"] + "?mirror=1"  # same text, different url
    both = pd.concat([base, dup], ignore_index=True)
    spark.createDataFrame(both, build_pages(spark, 1).schema).write.parquet(src)

    out = dedup_pages_stream(stream_pages(spark, src))
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql(
        "select count(*) as n, count(distinct text_md5) as d from dedup_stream"
    ).collect()[0]
    assert got["n"] == 60, "each duplicated text must survive exactly once"
    assert got["d"] == 60


def test_curation_columns_on_stream(spark, tmp_path):
    """The curation expressions (deterministic split/bucket, text
    features) are stateless scalar columns, so they run UNCHANGED on a
    stream — and produce byte-identical assignments to the batch path
    (content-addressed, so arrival order / micro-batching can't matter)."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.sampling import (
        deterministic_split, md5_bucket)

    src = str(tmp_path / "docs_in")
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(300),
                      "text": [f"streaming doc {i}" for i in range(300)]}),
        "doc_id long, text string")
    docs.repartition(3).write.parquet(src)

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    out = deterministic_split(stream).withColumn(
        "bucket", md5_bucket(F.col("text")))
    q = (out.writeStream.format("memory").queryName("cur")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["doc_id"]: (r["split"], r["bucket"])
           for r in spark.sql("select * from cur").collect()}
    expect = {r["doc_id"]: (r["split"], r["bucket"])
              for r in deterministic_split(docs)
              .withColumn("bucket", md5_bucket(F.col("text"))).collect()}
    assert got == expect and len(got) == 300


def test_signature_columns_on_stream(spark, tmp_path):
    """SimHash / MinHash signature columns are deterministic scalar
    Arrow kernels — they run UNCHANGED on Structured Streaming and
    produce values identical to the batch path (so streaming ingest
    can compute near-dup signatures at write time and the batch LSH
    join runs later over the accumulated table)."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.dedup import (
        minhash_signatures, simhash_signatures)

    src = str(tmp_path / "sig_in")
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200),
                      "text": [f"sig doc {i} " + "tok " * (i % 17)
                               for i in range(200)]}),
        "doc_id long, text string")
    docs.repartition(2).write.parquet(src)

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    for name, fn in (("sim", simhash_signatures),
                     ("minh", minhash_signatures)):
        q = (fn(stream).writeStream.format("memory").queryName(f"sigs_{name}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    got_sim = {r["doc_id"]: r["simhash"]
               for r in spark.sql("select * from sigs_sim").collect()}
    got_min = {r["doc_id"]: tuple(r["sig"])
               for r in spark.sql("select * from sigs_minh").collect()}
    exp_sim = {r["doc_id"]: r["simhash"]
               for r in simhash_signatures(docs).collect()}
    exp_min = {r["doc_id"]: tuple(r["sig"])
               for r in minhash_signatures(docs).collect()}
    assert got_sim == exp_sim and len(got_sim) == 200
    assert got_min == exp_min


def test_curation_stream_resume(spark, tmp_path):
    """Kill-and-resume for the curation path (VERDICT r4 #6): a
    foreachBatch curation stream stopped after draining the first file
    set and RESTARTED on the same checkpoint processes only the new
    files, and the final table carries exactly the batch-path rows —
    identical split assignment, no duplicates, no losses."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.curation import curate_corpus

    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    def mk(lo, hi):
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": range(lo, hi),
                          "text": [f"resume doc {i} " + " ".join(
                              f"w{i}x{j}" for j in range(30))
                              for i in range(lo, hi)]}),
            "doc_id long, text string")

    def drain():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "100").parquet(src))

        def write_batch(df, batch_id):
            curate_corpus(df).write.mode("append").parquet(out)

        q = (stream.writeStream.foreachBatch(write_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    mk(0, 150).repartition(1).write.mode("append").parquet(src)
    drain()                                    # first run: file set A
    n_after_a = spark.read.parquet(out).count()
    mk(150, 300).repartition(1).write.mode("append").parquet(src)
    drain()                                    # "restart": same ckpt

    got = {r["doc_id"]: r["split"]
           for r in spark.read.parquet(out).collect()}
    expect = {r["doc_id"]: r["split"]
              for r in curate_corpus(mk(0, 150)).collect()}
    expect.update({r["doc_id"]: r["split"]
                   for r in curate_corpus(mk(150, 300)).collect()})
    assert len(got) == spark.read.parquet(out).count()   # no duplicates
    assert got == expect                                 # identical splits
    assert n_after_a == sum(1 for d in expect if d < 150)


def test_url_and_gopher_columns_on_stream(spark, tmp_path):
    """Round-5 curation columns (URL normalization + Gopher rules) are
    stateless projections — identical outputs on Structured Streaming."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.text import with_gopher_rules
    from geo_sim_processing_a_spark.operators.urls import (
        normalize_urls, synth_messy_urls)

    src = str(tmp_path / "u_in")
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(120),
                      "source": [f"src{i % 7}" for i in range(120)],
                      "text": [("the data and that text have words to be "
                                "of use with more " * 4) if i % 3 else "tiny"
                               for i in range(120)]}),
        "doc_id long, source string, text string")
    docs.repartition(2).write.parquet(src)

    stream = (spark.readStream
              .schema("doc_id long, source string, text string").parquet(src))

    def cols(df):
        return (with_gopher_rules(normalize_urls(synth_messy_urls(df)))
                .select("doc_id", "url_norm", "domain", "gopher_pass"))

    q = (cols(stream).writeStream.format("memory").queryName("u5")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["doc_id"]: (r["url_norm"], r["domain"], r["gopher_pass"])
           for r in spark.sql("select * from u5").collect()}
    expect = {r["doc_id"]: (r["url_norm"], r["domain"], r["gopher_pass"])
              for r in cols(docs).collect()}
    assert got == expect and len(got) == 120


def test_hll_incremental_maintenance_on_stream(spark, tmp_path):
    """Streaming sketch maintenance: a foreachBatch stream that merges
    each micro-batch's HLL registers into a persisted register table
    (union + max re-aggregate = hll_merge) ends bit-identical to the
    one-shot batch sketch of all the data — the incremental-analytics
    contract that lets a 100-TB distinct-count stay current without
    rescans."""
    import pandas as pd
    from geo_sim_processing_a_spark.operators.sketches import (
        hll_estimate, hll_merge, hll_sketch)

    src = str(tmp_path / "hll_in")
    state = str(tmp_path / "hll_state")
    ckpt = str(tmp_path / "hll_ckpt")
    docs = spark.createDataFrame(
        pd.DataFrame({"g": [f"g{i % 2}" for i in range(400)],
                      "k": [f"key-{i % 173}-{i % 3}" for i in range(400)]}),
        "g string, k string")
    docs.repartition(4).write.parquet(src)   # several files -> batches

    def upsert(batch_df, batch_id):
        sk = hll_sketch(batch_df, "k", ["g"])
        try:
            prev = batch_df.sparkSession.read.parquet(state)
            merged = hll_merge(prev, sk)
        except Exception:
            merged = sk
        (merged.toPandas()
         .to_parquet(state + ".tmp.parquet"))   # tiny: <= m rows/group
        import os
        os.replace(state + ".tmp.parquet", state)

    stream = spark.readStream.schema("g string, k string").parquet(src)
    q = (stream.writeStream.foreachBatch(upsert)
         .option("checkpointLocation", ckpt)
         .option("maxFilesPerTrigger", "1")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    final = spark.read.parquet(state)
    batch = hll_sketch(docs, "k", ["g"])
    assert sorted(map(tuple, final.collect())) == \
        sorted(map(tuple, batch.collect()))
    est = {r["g"]: r["est"]
           for r in hll_estimate(final, ["g"]).collect()}
    exact = {r["g"]: r["c"] for r in
             docs.groupBy("g").agg(
                 __import__("pyspark.sql.functions", fromlist=["F"])
                 .countDistinct("k").alias("c")).collect()}
    for g, t in exact.items():
        assert abs(est[g] - t) / t < 0.25


def test_windowed_hll_registers_on_stream(spark, tmp_path):
    """Watermarked per-window HLL registers via the NATIVE streaming
    aggregation (groupBy(window, reg).max(rho) — max is a supported
    streaming agg), append mode: the emitted register rows for each
    closed window are bit-identical to the batch sketch of that
    window's rows, so per-window distinct estimates come from the
    stream without any raw-data rescan."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geo_sim_processing_a_spark.operators.sketches import (
        hll_estimate, hll_sketch)

    src = str(tmp_path / "whll_in")
    rows = pd.DataFrame({
        "ts": pd.to_datetime([f"2024-01-01 00:{m:02d}:00" for m in
                              [1, 2, 3, 11, 12, 13, 14, 21, 22]]),
        "k": ["a", "b", "a", "c", "d", "c", "e", "f", "f"]})
    docs = spark.createDataFrame(rows)
    docs.repartition(2).write.parquet(src)

    stream = (spark.readStream.schema("ts timestamp, k string")
              .parquet(src))
    from geo_sim_processing_a_spark.operators.sampling import md5_bucket
    # inline the register projection (hll_sketch aggregates eagerly;
    # here the aggregation must be the streaming one)
    from geo_sim_processing_a_spark.operators.sketches import (
        HASH_BITS, DEFAULT_P, _smear_bitlen)
    rho_w = HASH_BITS - DEFAULT_P
    h = md5_bucket(F.col("k"), 15)
    reg = F.shiftright(h, rho_w).cast("int")
    suffix = h.bitwiseAND(F.lit((1 << rho_w) - 1).cast("long"))
    rho = (F.lit(rho_w + 1) - _smear_bitlen(suffix)).cast("int")
    agg = (stream
           .withWatermark("ts", "1 minute")
           .select(F.window("ts", "10 minutes").alias("w"),
                   reg.alias("reg"), rho.alias("rho"))
           .groupBy("w", "reg")
           .agg(F.max("rho").alias("rho")))
    q = (agg.writeStream.format("memory").queryName("whll")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql(
        "select cast(w.start as string) as ws, reg, rho from whll")
    got_rows = {(r["ws"], r["reg"], r["rho"]) for r in got.collect()}

    batch = spark.createDataFrame(rows)
    want_rows = set()
    for start, mins in (("2024-01-01 00:00:00", (1, 2, 3)),
                        ("2024-01-01 00:10:00", (11, 12, 13, 14))):
        sub = batch.where(F.date_format("ts", "mm").cast("int")
                          .isin(list(mins)))
        for r in hll_sketch(sub, "k").collect():
            want_rows.add((start, r["reg"], r["rho"]))
    # append mode emits only windows the final watermark (max event
    # time 00:22 - 1 min = 00:21) has closed: 00:00 and 00:10; the
    # 00:20 window stays open and must be absent
    assert got_rows == want_rows
    assert not any(ws.startswith("2024-01-01 00:20") for ws, _, _ in got_rows)
