"""Round-6 optimization harness (spark_optimization_guide.md §1):
noop-sink isolated timing + .explain("formatted") capture per query.

Usage:
    python tools/bench_r06.py <tag> [sf_dir] [q1,q2,... | all] [reps]

For each named query it
  - writes plans/r06/<query>_<tag>.txt  (formatted physical plan), and
  - times `df.write.format("noop")` best-of-<reps> (computes every
    column of every row, no sink cost — guide §1.4),
then prints one JSON line {name: seconds}.  The pipeline pseudo-queries
geo_pipeline_sherbend[_smooth] time the same closure bench.py runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_segment_join", "q_curation_web", "q_dup_spans", "q_curation_fuzzy",
    "q_ngram_topk", "q_fuzzy_contamination", "q_bm25_search",
    "q_lm_perplexity", "q_semantic_dedup", "q_contamination",
    "q_simhash_near_dup7_sharded", "q_curation", "q_repetition",
    "q_chordal_axis", "q_minhash_cross_dedup", "q_pip_join", "q_knn",
    "q_minhash_near_dup", "q_poly_join", "q_ivf_topk", "q_domain_cap",
]


def plan_text(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return jqe.explainString(mode)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = (sys.argv[3].split(",") if len(sys.argv) > 3
             and sys.argv[3] != "all" else DEFAULT_QUERIES)
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from geo_sim_processing_a_spark.plans.session import get_spark
    from geo_sim_processing_a_spark.plans import driver_queries as Q

    spark = get_spark("bench_r06", cpus=cpus, shuffle_partitions=cpus)
    # same warmup policy as bench.py: worker pool + page cache
    spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    os.makedirs("plans/r06", exist_ok=True)
    qs = Q.all_queries()
    timings = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
            f.write(plan_text(df))
        best = None
        for _ in range(reps):
            df = qs[name](spark, sf_dir)  # rebuild: no plan-cache reuse
            spark.sparkContext.setJobDescription(f"{name} [{tag}]")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
