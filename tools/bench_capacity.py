"""Capacity datapoint (VERDICT r3 #7): 1M pages end-to-end at the
machine's full width, best-of-2, DRAM probe recorded.

Usage:
    python tools/bench_capacity.py [n_pages] [cpus] [reps]

Reuses bench_scaling's subprocess snippet (fresh JVM per rep, cold
cache) WITHOUT taskset pinning — this measures the box at full width,
where the memory system (not the engine) is the ceiling; see the
wider-machine disclosure in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

from bench_scaling import REPO, RUN_SNIPPET

# Curation at capacity (VERDICT r4 #5): curate_corpus end-to-end on the
# same 1M-page table — proves the map-side min_by dedup + repetition
# join hold at full width.  Records wall AND process-tree cpu_sec (the
# throttle-insensitive line bench.py also carries).
CURATION_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from geo_sim_processing_a_spark.plans.session import get_spark
from geo_sim_processing_a_spark.sources.spark_pages import build_pages
from geo_sim_processing_a_spark.operators.curation import curate_corpus
import bench

cpus = {cpus}
n_pages = {n_pages}
spark = get_spark("curation_capacity", cpus=cpus, shuffle_partitions=cpus)
spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()
build_pages(spark, 64, partitions=cpus).count()
c0 = bench.proc_tree_cpu_sec()
t0 = time.perf_counter()
pages = build_pages(spark, n_pages, partitions=cpus).select("url", "text")
out = curate_corpus(pages, id_col="url", min_tokens=5)
row = out.agg(F.count("*").alias("docs_out"),
              *[F.sum(F.when(F.col("split") == s, 1).otherwise(0)).alias(s)
                for s in ("train", "valid", "test")]).collect()[0]
dt = time.perf_counter() - t0
cpu = bench.proc_tree_cpu_sec() - c0
spark.stop()
print("RESULT " + json.dumps({{"cpus": cpus, "docs_in": n_pages,
    "docs_out": row["docs_out"],
    "split_counts": {{"train": row["train"], "valid": row["valid"],
                      "test": row["test"]}},
    "sec": round(dt, 2), "cpu_sec": round(cpu, 2),
    "docs_per_sec": round(n_pages / dt, 2)}}))
"""


def run_curation(cpus: int, n_pages: int) -> dict:
    code = CURATION_SNIPPET.format(repo=REPO, cpus=cpus, n_pages=n_pages)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail:\n{proc.stderr[-2000:]}")


# Sketches at capacity (round 5 session 2): HLL distinct + histogram
# quantiles over the same 1M-page table — ONE register hash-agg each,
# proving the bounded-register shapes at full width.
SKETCH_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from geo_sim_processing_a_spark.plans.session import get_spark
from geo_sim_processing_a_spark.sources.spark_pages import build_pages
from geo_sim_processing_a_spark.operators.sketches import (
    hist_quantiles, hist_sketch, hll_estimate, hll_sketch)
import bench

cpus = {cpus}
n_pages = {n_pages}
spark = get_spark("sketch_capacity", cpus=cpus, shuffle_partitions=cpus)
spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()
build_pages(spark, 64, partitions=cpus).count()
c0 = bench.proc_tree_cpu_sec()
t0 = time.perf_counter()
pages = build_pages(spark, n_pages, partitions=cpus).select("url", "text")
keyed = pages.select(F.col("url").alias("k"),
                     F.length("text").cast("double").alias("v"))
hrow = hll_estimate(hll_sketch(keyed, "k")).collect()[0]
qrows = hist_quantiles(hist_sketch(keyed, "v", lo=0.0, hi=4000.0, bins=1024),
                       [0.5, 0.99], lo=0.0, hi=4000.0, bins=1024).collect()
dt = time.perf_counter() - t0
cpu = bench.proc_tree_cpu_sec() - c0
spark.stop()
print("RESULT " + json.dumps({{"cpus": cpus, "rows": n_pages,
    "hll_est": hrow["est"], "n_regs": hrow["n_regs"],
    "quantiles7": {{str(r["q7"]): r["est7"] for r in qrows}},
    "sec": round(dt, 2), "cpu_sec": round(cpu, 2),
    "rows_per_sec": round(n_pages / dt, 2)}}))
"""


def run_sketch(cpus: int, n_pages: int) -> dict:
    code = SKETCH_SNIPPET.format(repo=REPO, cpus=cpus, n_pages=n_pages)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail:\n{proc.stderr[-2000:]}")


def probe() -> float:
    import numpy as np
    a = np.zeros(512 * 1024 * 1024 // 8)
    t0 = time.perf_counter()
    a.sum()
    return round(a.nbytes / (time.perf_counter() - t0) / 1e9, 2)


def run_unpinned(cpus: int, n_pages: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cpus=cpus, n_pages=n_pages)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail:\n{proc.stderr[-2000:]}")


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    probe_pre = probe()
    runs = [run_unpinned(cpus, n_pages) for _ in range(reps)]
    best = min(runs, key=lambda r: r["sec"])
    cur_runs = [run_curation(cpus, n_pages) for _ in range(reps)]
    cur_best = min(cur_runs, key=lambda r: r["sec"])
    sk_runs = [run_sketch(cpus, n_pages) for _ in range(reps)]
    sk_best = min(sk_runs, key=lambda r: r["sec"])
    probe_post = probe()
    print(json.dumps({"capacity": best, "all_secs": [r["sec"] for r in runs],
                      "curation": cur_best,
                      "curation_all_secs": [r["sec"] for r in cur_runs],
                      "sketches": sk_best,
                      "sketch_all_secs": [r["sec"] for r in sk_runs],
                      "n_pages": n_pages, "cpus": cpus,
                      "dram_gbps_pre": probe_pre,
                      "dram_gbps_post": probe_post}))


if __name__ == "__main__":
    main()
