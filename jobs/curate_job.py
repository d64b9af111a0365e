"""Cluster entry point: corpus curation via spark-submit.

    python tools/build_dist.py   # builds dist/geo_sim_spark.zip
    spark-submit --master local[8] \
        --py-files dist/geo_sim_spark.zip \
        jobs/curate_job.py --docs-path /path/docs.parquet \
        --out /tmp/curated --fuzzy --url-col url --cap-per-domain 1000

Reads a documents table (id + text [+ source/url]), runs the curation
composition — URL normalization + per-domain cap when a url column is
present, exact or MinHash-fuzzy dedup, Gopher quality rules, the
repetition filter, deterministic train/valid/test split — and writes
the surviving rows partitioned by split.  Every stage is the same
oracle-verified operator the driver battery runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-path", required=True,
                    help="parquet with (id, text[, url]) columns")
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", default=None,
                    help="when set: normalize URLs and cap per domain")
    ap.add_argument("--cap-per-domain", type=int, default=0,
                    help="0 = no cap (requires --url-col when > 0)")
    ap.add_argument("--fuzzy", action="store_true",
                    help="MinHash near-dup dedup instead of exact only")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-top-share", type=float, default=0.12)
    ap.add_argument("--gopher", action="store_true",
                    help="also require the full Gopher rule battery")
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--web", action="store_true",
                    help="full web pipeline (curate_web_pages): the "
                         "text column is a multi-line PAGE — boilerplate "
                         "strip + PII redaction + dedup on the redacted "
                         "content + quality + domain cap + split; "
                         "requires --url-col")
    ap.add_argument("--boiler-min-docs", type=int, default=5,
                    help="--web: line document-frequency threshold")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("geo_sim_spark.curate").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from geo_sim_processing_a_spark.operators.curation import (
        curate_corpus, curate_corpus_fuzzy)
    from geo_sim_processing_a_spark.operators.text import with_gopher_rules
    from geo_sim_processing_a_spark.operators.urls import (
        domain_cap, normalize_urls)

    docs = spark.read.parquet(args.docs_path)
    n_in = docs.count()

    if args.web:
        if not args.url_col:
            raise SystemExit("--web requires --url-col")
        if args.fuzzy or args.gopher:
            raise SystemExit("--web is its own composition; "
                             "--fuzzy/--gopher do not apply")
        from geo_sim_processing_a_spark.operators.curation import (
            curate_web_pages)
        out = curate_web_pages(
            docs, id_col=args.id_col, url_col=args.url_col,
            page_col=args.text_col,
            boiler_min_docs=args.boiler_min_docs,
            min_tokens=args.min_tokens,
            max_top_share=args.max_top_share,
            cap_per_domain=args.cap_per_domain or 10)
        _write_and_report(spark, out, args.out, n_in)
        return

    if args.url_col:
        docs = normalize_urls(docs, url_col=args.url_col)
        if args.cap_per_domain > 0:
            docs = domain_cap(docs, args.cap_per_domain,
                              id_col=args.id_col, text_col=args.text_col)
    elif args.cap_per_domain > 0:
        raise SystemExit("--cap-per-domain requires --url-col")

    curate = curate_corpus_fuzzy if args.fuzzy else curate_corpus
    out = curate(docs, id_col=args.id_col, text_col=args.text_col,
                 min_tokens=args.min_tokens,
                 max_top_share=args.max_top_share)

    if args.gopher:
        out = (with_gopher_rules(out, text_col=args.text_col,
                                 min_words=args.gopher_min_words)
               .where(F.col("gopher_pass"))
               .drop("g1", "g2", "g3", "g4", "g5", "g6", "g7"))

    _write_and_report(spark, out, args.out, n_in)


def _write_and_report(spark, out, out_path, n_in):
    from pyspark.sql import functions as F

    # persist: consumed by the write AND the stats aggregate (an empty
    # result would also make a read-back fail on schema inference)
    out = out.persist()
    out.write.mode("overwrite").partitionBy("split").parquet(out_path)
    stats = {
        "docs_in": n_in,
        "docs_out": out.count(),
        "splits": {r["split"]: r["n"] for r in
                   out.groupBy("split").agg(F.count("*").alias("n"))
                   .collect()},
    }
    out.unpersist()
    print("CURATE_STATS " + json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
