"""Sharded SimHash radius-7 proof at sf0.1 scale (VERDICT r4 #3).

Demonstrates, on the real sf0.1 documents table plus planted
Hamming-4..7 twins, that ``shard_cols=('lang',)``:
  1. cuts the banded-join candidate volume (measured analytically via
     simhash_candidate_volume AND by executing both joins), and
  2. preserves the full pigeonhole recall guarantee WITHIN shards —
     every planted same-lang twin with measured signature Hamming <= 7
     comes back from the sharded join.

Writes BENCH/simhash_shard_proof_r05.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F

    from geo_sim_processing_a_spark.operators.dedup import (
        simhash_candidate_volume, simhash_pairs, simhash_signatures)
    from geo_sim_processing_a_spark.plans.session import get_spark

    spark = get_spark("simhash_shard_proof", cpus=16, shuffle_partitions=16)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()

    # ---- plant twins: token edits of increasing strength; keep the
    # measured signature Hamming as ground truth ----
    base = [r.asDict() for r in
            docs.orderBy("doc_id").limit(40).collect()]
    twins = []
    for i, row in enumerate(base):
        toks = row["text"].split()
        k = 1 + i % 6                      # edit strength 1..6 tokens
        for j in range(min(k, len(toks))):
            toks[(j * 7) % len(toks)] = f"edt{i}x{j}"
        twins.append({"doc_id": 1_000_000 + row["doc_id"],
                      "text": " ".join(toks), "lang": row["lang"],
                      "source": row["source"],
                      "n_chars": row["n_chars"]})
    corpus = docs.unionByName(spark.createDataFrame(twins))

    sig = {r["doc_id"]: r["simhash"]
           for r in simhash_signatures(corpus).collect()}
    planted = []
    for row in base:
        a, b = row["doc_id"], 1_000_000 + row["doc_id"]
        ham = bin(sig[a] ^ sig[b]).count("1")
        if 4 <= ham <= 7:
            planted.append((a, b, ham, row["lang"]))
    print(f"planted twins with measured Hamming 4..7: {len(planted)} "
          f"(hammings {sorted(h for _, _, h, _ in planted)})")

    # ---- analytic candidate volumes (no join executed) ----
    def volumes(shard_cols):
        rows = simhash_candidate_volume(
            corpus, max_hamming=7, shard_cols=shard_cols).collect()
        return {"per_band": [
                    {"band": r["band"], "n_buckets": r["n_buckets"],
                     "max_bucket": r["max_bucket"],
                     "candidates": r["candidates"]} for r in rows],
                "total": int(sum(r["candidates"] for r in rows))}

    vol_unsharded = volumes(())
    vol_sharded = volumes(("lang",))

    # ---- execute both joins, count candidates-surviving-verify ----
    def run_pairs(shard_cols):
        t0 = time.perf_counter()
        got = {(r["id_a"], r["id_b"])
               for r in simhash_pairs(corpus, max_hamming=7,
                                      shard_cols=shard_cols).collect()}
        return got, round(time.perf_counter() - t0, 2)

    pairs_u, wall_u = run_pairs(())
    pairs_s, wall_s = run_pairs(("lang",))

    missed = [(a, b, h, l) for a, b, h, l in planted
              if (a, b) not in pairs_s and (b, a) not in pairs_s]
    assert not missed, f"sharded join missed planted in-shard pairs: {missed}"
    # sharded output = unsharded pairs whose docs share a lang
    lang_of = {r["doc_id"]: r["lang"]
               for r in corpus.select("doc_id", "lang").collect()}
    expect_s = {p for p in pairs_u if lang_of[p[0]] == lang_of[p[1]]}
    assert pairs_s == expect_s, (
        f"sharded != lang-filtered unsharded: "
        f"{len(pairs_s ^ expect_s)} differing pairs")

    # langs at this SF for the envelope line
    lang_counts = {r["lang"]: r["c"] for r in
                   corpus.groupBy("lang").agg(F.count("*").alias("c")).collect()}

    report = {
        "sf_dir": SF_DIR, "n_docs_corpus": n_docs + len(twins),
        "planted_pairs_hamming_4_7": len(planted),
        "candidate_volume_unsharded": vol_unsharded,
        "candidate_volume_sharded_lang": vol_sharded,
        "volume_reduction_factor": round(
            vol_unsharded["total"] / max(vol_sharded["total"], 1), 2),
        "pairs_unsharded": len(pairs_u),
        "pairs_sharded": len(pairs_s),
        "sharded_equals_lang_filtered_unsharded": True,
        "planted_recall_in_shard": 1.0,
        "wall_unsharded_s": wall_u, "wall_sharded_s": wall_s,
        "lang_shard_sizes": lang_counts,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "simhash_shard_proof_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
