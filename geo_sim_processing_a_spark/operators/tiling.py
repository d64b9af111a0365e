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


def _cover_batch(pdf: pd.DataFrame, res: int) -> pd.DataFrame:
    """Vectorized halo cover of one Arrow batch: per-geometry bbox via
    ``np.minimum.reduceat`` over the concatenated coordinates, cover
    grid enumerated with repeat/arange arithmetic, owner cell from the
    first vertex — zero per-row Python."""
    n = len(pdf)
    if n == 0:
        out = pdf.copy()
        out["cell"] = pd.Series([], dtype="int64")
        out["is_owner"] = pd.Series([], dtype="bool")
        return out
    xs_list = pdf["xs"].tolist()
    ys_list = pdf["ys"].tolist()
    lens = np.fromiter((len(v) for v in xs_list), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    fx = np.concatenate([np.asarray(v, dtype=np.float64) for v in xs_list])
    fy = np.concatenate([np.asarray(v, dtype=np.float64) for v in ys_list])
    minx = np.minimum.reduceat(fx, starts)
    maxx = np.maximum.reduceat(fx, starts)
    miny = np.minimum.reduceat(fy, starts)
    maxy = np.maximum.reduceat(fy, starts)

    ix0, iy0 = C.lonlat_to_ixiy(minx, miny, res)
    ix1, iy1 = C.lonlat_to_ixiy(maxx, maxy, res)
    w = ix1 - ix0 + 1
    h = iy1 - iy0 + 1
    counts = w * h
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(n), counts)
    cum = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    k = np.arange(total, dtype=np.int64) - cum[row_idx]
    wr = w[row_idx]
    ix = ix0[row_idx] + (k % wr)
    iy = iy0[row_idx] + (k // wr)
    cells = C.encode_ixiy(ix, iy, res)
    owner = C.encode(fx[starts], fy[starts], res)
    is_owner = cells == owner[row_idx]

    out = pdf.iloc[row_idx].reset_index(drop=True)
    out["cell"] = cells
    out["is_owner"] = is_owner
    return out


def with_cell_cover(geoms: DataFrame, res: int) -> DataFrame:
    """geoms(url, kind, xs, ys, ...) -> exploded (cell, is_owner, ...):
    every geometry is duplicated into each covered cell (halo), with
    exactly one owner copy (owner = cell of the first vertex)."""
    out_fields = geoms.schema.simpleString()[len("struct<"):-1].replace(":", " ")
    out_schema = out_fields + ", cell long, is_owner boolean"

    def run(batches):
        for pdf in batches:
            yield _cover_batch(pdf, res)

    return geoms.mapInPandas(run, out_schema)


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
    # no repartition here: the kernel stage owns the single
    # (cell, salt) shuffle (plans/pipeline.simplify_tiles)
    return salted.drop("n_salt", "home_salt")


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
