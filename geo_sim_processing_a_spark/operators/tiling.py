"""Tiling contract + skew salting (SURVEY.md §2.4 X7/X10/X11, §4.3).

Tiling contract (correctness-critical at any scale):
 - every geometry is duplicated into EVERY cell its bbox covers at the
   chosen resolution (halo duplication), so a tile kernel sees all
   geometries whose segments can interact with its own;
 - exactly one copy is the OWNER (owner rule: the cell of the
   geometry's first vertex) and only the owner's kernel emits output —
   dedup-by-construction, no post-shuffle distinct needed.

Skew salting (two-pass):
 - pass 1: groupBy(cell).count() — partial+final hash agg, cheap;
 - pass 2: n_salt(cell) = ceil(count / target_rows_per_task) joined
   back broadcast; salt = pmod(xxhash64(url), n_salt); repartition on
   (cell, salt).  Kernels group by (cell, salt); owners are disjoint
   across salts so outputs remain exact.  AQE skew-join stays on as a
   backstop (plans/session.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells as C


def cover_cells_arrays(xs: np.ndarray, ys: np.ndarray, res: int) -> np.ndarray:
    """Cells covered by one geometry's bbox at ``res`` (halo set)."""
    return C.cover_bbox(float(np.min(xs)), float(np.min(ys)),
                        float(np.max(xs)), float(np.max(ys)), res)


def with_cell_cover(geoms: DataFrame, res: int) -> DataFrame:
    """geoms(url, kind, xs, ys, ...) -> exploded (cell, is_owner, ...).

    The cover + owner computation runs in one Arrow batch UDF (no
    per-row Python beyond the tiny per-geometry cover list)."""
    out_schema = T.ArrayType(T.StructType([
        T.StructField("cell", T.LongType()),
        T.StructField("is_owner", T.BooleanType()),
    ]))

    @F.pandas_udf(out_schema)
    def cover_udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(xs, ys):
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            cov = cover_cells_arrays(x, y, res)
            owner = int(C.encode(x[:1], y[:1], res)[0])
            out.append([{"cell": int(c), "is_owner": bool(c == owner)} for c in cov])
        return pd.Series(out)

    exploded = (geoms
                .withColumn("_cov", F.explode(cover_udf("xs", "ys")))
                .withColumn("cell", F.col("_cov.cell"))
                .withColumn("is_owner", F.col("_cov.is_owner"))
                .drop("_cov"))
    return exploded


def salt_by_cell(df: DataFrame, key_col: str = "url", cell_col: str = "cell",
                 target_rows_per_task: int = 20_000,
                 replicate_context: bool = True) -> DataFrame:
    """Two-pass skew salting; adds ``salt`` and repartitions on
    (cell, salt).

    With ``replicate_context`` (required for interacting kernels like
    Sherbend, SURVEY.md §4.3.2): every row of a hot cell is REPLICATED
    to each salt replica as read-only context, and ``is_owner`` stays
    true only in the row's home salt — each replica sees the full
    constraint context, outputs stay exact, and ownership is disjoint.
    Independent-feature kernels (DP/VW) can skip replication."""
    counts = (df.groupBy(cell_col).count()
                .withColumn("n_salt",
                            F.greatest(F.lit(1),
                                       F.ceil(F.col("count") / F.lit(target_rows_per_task))
                                       .cast("int")))
                .drop("count"))
    base = (df.join(F.broadcast(counts), on=cell_col, how="left")
              .withColumn("n_salt", F.coalesce(F.col("n_salt"), F.lit(1)))
              .withColumn("home_salt",
                          F.pmod(F.xxhash64(F.col(key_col)), F.col("n_salt")).cast("int")))
    if replicate_context and "is_owner" in df.columns:
        salted = (base
                  .withColumn("salt", F.explode(F.sequence(F.lit(0), F.col("n_salt") - 1)))
                  .withColumn("salt", F.col("salt").cast("int"))
                  .withColumn("is_owner",
                              F.col("is_owner") & (F.col("salt") == F.col("home_salt"))))
    else:
        salted = base.withColumn("salt", F.col("home_salt"))
    salted = salted.drop("n_salt", "home_salt")
    return salted.repartition(F.col(cell_col), F.col("salt"))


def raster_tile_assign(geoms: DataFrame, res: int, sub_res: int = 4) -> DataFrame:
    """X10 — raster<->vector tile assignment: per covered cell, a
    (2^sub_res)^2 occupancy bitmask of which sub-cells the geometry's
    bbox rasterizes into.  Arrow-batched; returns
    (cell, url, occupancy array<boolean> flattened row-major)."""
    n_sub = 1 << sub_res

    covered = with_cell_cover(geoms, res)

    @F.pandas_udf(T.ArrayType(T.BooleanType()))
    def occupancy_udf(cell: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for c, x, y in zip(cell, xs, ys):
            lon0, lat0, lon1, lat1 = C.cell_bounds(np.array([c], dtype=np.int64))
            lon0, lat0, lon1, lat1 = float(lon0[0]), float(lat0[0]), float(lon1[0]), float(lat1[0])
            x = np.asarray(x, dtype=np.float64)
            y = np.asarray(y, dtype=np.float64)
            gx0 = max(0, min(n_sub - 1, int((np.min(x) - lon0) / (lon1 - lon0) * n_sub)))
            gx1 = max(0, min(n_sub - 1, int((np.max(x) - lon0) / (lon1 - lon0) * n_sub)))
            gy0 = max(0, min(n_sub - 1, int((np.min(y) - lat0) / (lat1 - lat0) * n_sub)))
            gy1 = max(0, min(n_sub - 1, int((np.max(y) - lat0) / (lat1 - lat0) * n_sub)))
            grid = np.zeros((n_sub, n_sub), dtype=bool)
            grid[gy0:gy1 + 1, gx0:gx1 + 1] = True
            out.append(grid.ravel().tolist())
        return pd.Series(out)

    return covered.withColumn("occupancy", occupancy_udf("cell", "xs", "ys"))
