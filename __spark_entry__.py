"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-tile Sherbend pipeline over the
sf0.001 tables; ``queries()``/``oracle_sql()`` expose the operator
battery from SURVEY.md §2 with DuckDB oracles where ANSI-SQL can
express the semantics (geometry kernels are rows-only by design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: geocode pages derived
    from the documents table, tile them with halo/owner semantics, and
    reduce bends per tile (Sherbend kernel via applyInPandas)."""
    from geo_sim_processing_a_spark.plans.driver_queries import q_reduce_bend_tiles
    return q_reduce_bend_tiles(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geo_sim_processing_a_spark.plans.driver_queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    from geo_sim_processing_a_spark.plans.driver_queries import all_oracles
    return all_oracles()
