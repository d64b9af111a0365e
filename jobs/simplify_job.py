"""Cluster entry point: the flagship pipeline via spark-submit.

    python tools/build_dist.py   # builds dist/geo_sim_spark.zip
    spark-submit --master local[8] \
        --py-files dist/geo_sim_spark.zip \
        jobs/simplify_job.py --pages 100000 --out /tmp/geo_out --res 6

On a real cluster replace --master and add executor confs; the job is
resumable: re-submitting with the same --out only runs missing tiles
(manifest, SURVEY.md S7).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# importable under spark-submit --py-files AND under a bare
# `python jobs/simplify_job.py` from a repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--pages-path", default=None,
                    help="read an existing pages parquet instead of synthesizing")
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=6)
    ap.add_argument("--tol", type=float, default=0.004)
    ap.add_argument("--kernel", default="sherbend", choices=["sherbend", "dp", "vw"])
    ap.add_argument("--smooth", action="store_true")
    ap.add_argument("--target-rows-per-task", type=int, default=20_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("geo_sim_spark.simplify").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from geo_sim_processing_a_spark.plans.pipeline import run_pipeline
    from geo_sim_processing_a_spark.sources.spark_pages import build_pages

    if args.pages_path:
        pages = spark.read.parquet(args.pages_path)
    else:
        pages = build_pages(spark, args.pages)

    stats = run_pipeline(spark, pages, args.out, res=args.res,
                         diameter_tol=args.tol, kernel=args.kernel,
                         smooth=args.smooth,
                         target_rows_per_task=args.target_rows_per_task)
    print("PIPELINE_STATS " + json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
