"""Mergeable distributed sketches — HyperLogLog distinct-count and
Count-Min frequency — the canonical 100-TB aggregation shapes: both
reduce map-side (register-max / counter-sum have perfect partial
aggregation), their state is tiny and UNION+re-aggregate IS the merge,
so incremental builds (yesterday's sketch + today's partition) never
rescan history.  Flajolet et al. 2007 (HLL); Cormode & Muthukrishnan
2005 (CMS).

Engine-exactness discipline (same as operators/lm.py / dsir.py):

* The hash is the md5-prefix integer (sampling.md5_bucket) — byte
  identical in every engine with an md5 function, unlike
  engine-private hash64s, so a DuckDB oracle can rebuild the EXACT
  same sketch.
* Register arithmetic is all-integer: rho (leading-zero rank) comes
  from a bit-smear + bit_count, never floor(log2(x)) (float log is
  exact here but the integer route is provably exact); the HLL
  indicator sum folds 2^(RHO_W+1-rho) as BIGINT (max m * 2^52 < 2^62
  — no overflow, and integer sums are associative where double sums
  are not).
* The only floats are the final estimate formula, evaluated with
  IDENTICAL IEEE parenthesization in both engines from exact-integer
  inputs and a shared literal alpha — deterministic, so even the
  float estimate hash-matches.

Scale notes (100 TB): hll_sketch is scan → ONE hash-agg to at most
m rows per group (m=512 default); cms_sketch likewise to depth*width
rows per group.  Estimation joins are broadcast (probe lists are
small by construction).  Skewed groups cost nothing extra: the
register/counter key space bounds the reduce fan-in per group
regardless of group row count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import md5_bucket

# md5_bucket(key, 15) yields a uniform 60-bit integer; HLL splits it
# into a P-bit register index and a RHO_W-bit suffix whose
# leading-zero rank feeds the register.
HASH_NIBBLES = 15
HASH_BITS = 4 * HASH_NIBBLES          # 60
DEFAULT_P = 9                         # m = 512 registers


def _hll_alpha(m: int) -> float:
    """Bias constant alpha_m (Flajolet et al. 2007 eq. for m >= 128).
    Computed once in Python and embedded as the SAME literal in the
    Spark plan and any SQL twin, so both engines parse one double."""
    return 0.7213 / (1.0 + 1.079 / m)


def _smear_bitlen(col: Column) -> Column:
    """Integer bit-length of a non-negative BIGINT: smear the highest
    set bit rightward, then popcount.  0 -> 0, 1 -> 1, 12 -> 4.
    DuckDB twin: same shifts/ORs/bit_count operator-for-operator."""
    smeared = reduce(
        lambda acc, s: acc.bitwiseOR(F.shiftright(acc, s)),
        (1, 2, 4, 8, 16, 32), col)
    return F.bit_count(smeared)


def hll_sketch(df: DataFrame, key_col: str,
               group_cols: list[str] | None = None,
               p: int = DEFAULT_P) -> DataFrame:
    """HyperLogLog register table for the distinct count of
    ``key_col`` per group: (``group_cols...``, reg int, rho int) with
    at most ``2**p`` register rows per group.  ONE hash-agg (max has
    map-side partials); absent registers mean rho 0.

    Merging sketches from different inputs/days is
    ``union -> groupBy(group, reg).max(rho)`` (hll_merge) and is
    EXACTLY the sketch of the concatenated input — asserted
    register-identical in tests.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    group_cols = list(group_cols or [])
    rho_w = HASH_BITS - p
    h = md5_bucket(F.col(key_col), HASH_NIBBLES)
    reg = F.shiftright(h, rho_w).cast("int")
    suffix = h.bitwiseAND(F.lit((1 << rho_w) - 1).cast("long"))
    # rank of first set bit from the left of the rho_w-wide suffix:
    # rho = rho_w - bitlen(suffix) + 1; all-zero suffix -> rho_w + 1
    rho = (F.lit(rho_w + 1) - _smear_bitlen(suffix)).cast("int")
    # NULL keys drop (a NULL register row would silently skew the
    # estimate, and NULL-key hashing diverges between engines)
    return (df
            .where(F.col(key_col).isNotNull())
            .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
            .groupBy(*group_cols, "reg")
            .agg(F.max("rho").alias("rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables built by hll_sketch over the SAME key/p:
    position-wise register max.  Distributive, associative,
    idempotent — the sketch of A ∪ B, bit-equal to a one-shot build."""
    if not sketches:
        raise ValueError("need at least one sketch")
    cols = sketches[0].columns
    group_regs = [c for c in cols if c != "rho"]
    merged = reduce(lambda a, b: a.unionByName(b), sketches)
    return merged.groupBy(*group_regs).agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame,
                 group_cols: list[str] | None = None,
                 p: int = DEFAULT_P) -> DataFrame:
    """Distinct-count estimate per group from an hll_sketch register
    table: (``group_cols...``, n_regs, ind_sum, est).

    ``ind_sum`` = the EXACT integer Sigma 2^(rho_w+1-rho_i) over
    present registers (absent registers contribute 2^(rho_w+1), added
    as (m - n_regs) * 2^(rho_w+1)); the raw estimate is
    alpha_m * m^2 * 2^(rho_w+1) / ind_sum and Flajolet's small-range
    linear counting (m * ln(m / V)) applies when raw <= 2.5m with V
    empty registers.  Standard error ~ 1.04/sqrt(m) (~4.6% at p=9)."""
    group_cols = list(group_cols or [])
    m = 1 << p
    rho_w = HASH_BITS - p
    scale = 1 << (rho_w + 1)           # 2^-rho in units of 1/scale
    # column-valued shift amount needs the SQL form (bloom.py idiom)
    term = F.expr(f"shiftleft(1L, CAST({rho_w + 1} - rho AS INT))")
    agg = (sketch.groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("n_regs"),
                F.sum(term).alias("present_sum")))
    ind_sum = (F.col("present_sum")
               + (F.lit(m) - F.col("n_regs")) * F.lit(scale).cast("long"))
    alpha = _hll_alpha(m)
    raw = (F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(scale))
           / ind_sum.cast("double"))
    v = (F.lit(m) - F.col("n_regs")).cast("double")
    est = F.when((raw <= F.lit(2.5 * m)) & (v > F.lit(0.0)),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)
                 ).otherwise(raw)
    return (agg
            .withColumn("ind_sum", ind_sum.cast("long"))
            .withColumn("est", F.round(est).cast("long"))
            .select(*group_cols, "n_regs", "ind_sum", "est"))


def hll_estimate_sql(registers_cte: str, group_cols: list[str],
                     p: int = DEFAULT_P) -> str:
    """DuckDB twin of hll_estimate over a CTE named ``registers_cte``
    with columns (group_cols..., reg, rho) — the same integer fold and
    the same float formula, literal-for-literal."""
    m = 1 << p
    rho_w = HASH_BITS - p
    scale = 1 << (rho_w + 1)
    alpha = _hll_alpha(m)
    gsel = ", ".join(group_cols)
    gpfx = gsel + ", " if gsel else ""
    # every float literal rides an explicit DOUBLE cast: DuckDB parses
    # bare decimal literals as DECIMAL and multiplies them exactly —
    # which both overflows and diverges from Spark's double arithmetic
    al = f"CAST({alpha!r} AS DOUBLE)"
    m2 = f"CAST({float(m * m)!r} AS DOUBLE)"
    sc = f"CAST({float(scale)!r} AS DOUBLE)"
    md = f"CAST({float(m)!r} AS DOUBLE)"
    raw = f"{al} * {m2} * {sc} / CAST(ind_sum AS DOUBLE)"
    return f"""
  SELECT {gpfx}n_regs, ind_sum,
         CAST(round(CASE WHEN ({raw}) <= CAST({2.5 * m!r} AS DOUBLE)
                         AND ({m} - n_regs) > 0
                    THEN {md} * ln({md}
                            / CAST({m} - n_regs AS DOUBLE))
                    ELSE {raw} END)
              AS BIGINT) AS est
  FROM (
    SELECT {gpfx}CAST(count(*) AS BIGINT) AS n_regs,
           CAST(sum(1::BIGINT << ({rho_w + 1} - rho)) AS BIGINT)
             + ({m} - CAST(count(*) AS BIGINT)) * {scale} AS ind_sum
    FROM {registers_cte}
    {"GROUP BY " + gsel if gsel else ""}
  )"""


def hll_sketch_sql(src_cte: str, key_expr: str, group_cols: list[str],
                   p: int = DEFAULT_P) -> str:
    """DuckDB twin of hll_sketch: SELECT body producing
    (group_cols..., reg, rho) from ``src_cte``.``key_expr``."""
    rho_w = HASH_BITS - p
    gpfx = ", ".join(group_cols) + ", " if group_cols else ""
    h = (f"CAST(('0x' || substr(md5({key_expr}), 1, "
         f"{HASH_NIBBLES}))::UBIGINT AS BIGINT)")
    sfx = f"(h & {(1 << rho_w) - 1})"
    smear = sfx
    for s in (1, 2, 4, 8, 16, 32):
        smear = f"({smear} | ({smear} >> {s}))"
    # NOTE: smear is re-expanded textually; cheap for the oracle
    return f"""
  SELECT {gpfx}reg, CAST(max(rho) AS INT) AS rho FROM (
    SELECT {gpfx}CAST((h >> {rho_w}) AS INT) AS reg,
           {rho_w + 1} - bit_count(CAST({smear} AS BIGINT)) AS rho
    FROM (SELECT {gpfx}{h} AS h FROM {src_cte})
  ) GROUP BY {gpfx}reg"""


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

CMS_SEP = "\x1f"                       # row-index | key separator


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in hash row ``row``: md5 of 'row<US>key'
    folded to [0, width).  8 nibbles = 32 uniform bits before pmod."""
    return F.pmod(md5_bucket(F.concat_ws(CMS_SEP, F.lit(str(row)), key), 8),
                  F.lit(width)).cast("int")


def cms_sketch(df: DataFrame, key_col: str,
               group_cols: list[str] | None = None,
               weight_col: str | None = None,
               depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-Min counter table: (group_cols..., row int, bucket int,
    cnt long) with at most depth*width rows per group.  One scan (the
    depth hash rows explode inline), ONE hash-agg; merging sketches is
    union -> sum (cms_merge).  Point estimates overcount by at most
    e/width * total_weight with prob 1 - e^-depth (CM 2005)."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; "
                         f"got {depth}, {width}")
    group_cols = list(group_cols or [])
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    key = F.col(key_col)
    # NULL keys drop BEFORE hashing: Spark's concat_ws skips NULL
    # arguments while SQL || propagates them, so a NULL key would
    # hash to a real bucket here and to NULL in an oracle
    df = df.where(key.isNotNull())
    rows = F.explode(F.array(*[
        F.struct(F.lit(j).alias("row"),
                 _cms_bucket(key, j, width).alias("bucket"))
        for j in range(depth)])).alias("rb")
    return (df
            .select(*group_cols, w.alias("_w"), rows)
            .select(*group_cols, "rb.row", "rb.bucket", "_w")
            .groupBy(*group_cols, "row", "bucket")
            .agg(F.sum("_w").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge counter tables built with the SAME depth/width/key:
    position-wise sum — exactly the sketch of the concatenated
    input."""
    if not sketches:
        raise ValueError("need at least one sketch")
    cols = [c for c in sketches[0].columns if c != "cnt"]
    merged = reduce(lambda a, b: a.unionByName(b), sketches)
    return merged.groupBy(*cols).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                 group_cols: list[str] | None = None,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Estimated frequency of each probe row: one output row per row
    of ``probes`` — (probes' group_cols..., key_col, est) with est =
    min over hash rows of the counter at that row's bucket; a bucket
    row absent from the sketch is a 0 counter, so keys the sketch can
    rule out report est 0 instead of disappearing.  When grouped,
    ``probes`` must carry the group columns (its rows ARE the exact
    (group, key) query set).  ``probes`` is small by construction and
    broadcasts; the sketch never re-shuffles."""
    group_cols = list(group_cols or [])
    key = F.col(key_col)
    probes = probes.where(key.isNotNull())   # same NULL rule as the build
    probe_rows = (probes
                  .select(*group_cols, key_col, F.explode(F.array(*[
                      F.struct(F.lit(j).alias("row"),
                               _cms_bucket(key, j, width).alias("bucket"))
                      for j in range(depth)])).alias("rb"))
                  .select(*group_cols, key_col, "rb.row", "rb.bucket"))
    joined = sketch.join(F.broadcast(probe_rows),
                         group_cols + ["row", "bucket"])
    per_row = (joined.groupBy(*group_cols, key_col)
               .agg(F.min("cnt").alias("min_cnt"),
                    F.count(F.lit(1)).alias("n_rows")))
    # any hash row whose bucket is absent pins the min to 0
    est = F.when(F.col("n_rows") < F.lit(depth),
                 F.lit(0).cast("long")).otherwise(F.col("min_cnt"))
    return (probes.select(*group_cols, key_col).distinct()
            .join(per_row, group_cols + [key_col], "left")
            .select(*group_cols, key_col,
                    F.coalesce(est, F.lit(0).cast("long")).alias("est")))


def cms_bucket_sql(key_expr: str, row: int, width: int) -> str:
    """DuckDB twin of _cms_bucket."""
    concat = f"'{row}' || chr(31) || ({key_expr})"
    return (f"CAST(CAST(('0x' || substr(md5({concat}), 1, 8))"
            f"::UBIGINT AS BIGINT) % {width} AS INT)")


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ---------------------------------------------------------------------------

def hist_sketch(df: DataFrame, value_col: str,
                group_cols: list[str] | None = None,
                lo: float = 0.0, hi: float = 1.0,
                bins: int = 1024) -> DataFrame:
    """Equi-width histogram sketch of ``value_col`` over the KNOWN
    range [lo, hi): (group_cols..., bin int, cnt long) with at most
    ``bins`` rows per group — ONE hash-agg with map-side sum partials;
    out-of-range values clamp into the edge bins (count toward the
    estimate, like any fixed-range histogram); NULLs drop.  Merging
    daily sketches is union -> sum (hist_merge) and equals the
    one-shot histogram bit-for-bit.

    This is the engine-portable, artifact-persistable counterpart of
    approx_percentile: the register table is data, so tomorrow's
    partition merges in without a rescan and a DuckDB oracle rebuilds
    it exactly (same clamp-floor arithmetic)."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    group_cols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo)))
                  / F.lit(float(hi - lo)) * F.lit(bins)).cast("long")
    b = F.least(F.greatest(raw, F.lit(0).cast("long")),
                F.lit(bins - 1).cast("long")).cast("int")
    return (df.where(v.isNotNull())
            .select(*group_cols, b.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).alias("cnt")))


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches built with the SAME lo/hi/bins:
    position-wise count sum."""
    if not sketches:
        raise ValueError("need at least one sketch")
    cols = [c for c in sketches[0].columns if c != "cnt"]
    merged = reduce(lambda a, b: a.unionByName(b), sketches)
    return merged.groupBy(*cols).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(sketch: DataFrame, qs: list[float],
                   group_cols: list[str] | None = None,
                   lo: float = 0.0, hi: float = 1.0,
                   bins: int = 1024) -> DataFrame:
    """Quantile estimates from a hist_sketch register table: for each
    q in ``qs``, locate the bin holding rank ceil(q*n) (clamped >= 1)
    and linearly interpolate inside it; the estimate is quantized to
    an integer in 1e-7 units (est7) so engines can never diverge in a
    float ulp.  Returns (group_cols..., q7, rank, bin, est7) with
    q7 = round(q*1e7) (integer-keyed quantile id).  Error bound:
    one bin width (hi-lo)/bins, regardless of data skew WITHIN the
    range — pick lo/hi/bins for the column's scale.

    Shape: cumulative counts via a window over at most ``bins`` rows
    per group (the sketch, never the data), then one filter keeps the
    single covering bin per (group, q)."""
    group_cols = list(group_cols or [])
    if not qs:
        raise ValueError("qs must be non-empty")
    if not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    from pyspark.sql.window import Window
    win = (Window.partitionBy(*group_cols) if group_cols
           else Window.partitionBy()).orderBy("bin")
    cum = (sketch
           .withColumn("cum", F.sum("cnt").over(win))
           .withColumn("n", F.sum("cnt").over(
               (Window.partitionBy(*group_cols) if group_cols
                else Window.partitionBy())
               .rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing))))
    qf = F.explode(F.array(*[F.lit(float(q)) for q in sorted(qs)])).alias("q")
    expanded = cum.select(*cum.columns, qf)
    rank = F.greatest(F.ceil(F.col("q") * F.col("n")).cast("long"),
                      F.lit(1).cast("long"))
    width = float(hi - lo) / bins
    est = (F.lit(float(lo))
           + (F.col("bin").cast("double")
              + (rank - (F.col("cum") - F.col("cnt"))).cast("double")
              / F.col("cnt").cast("double")) * F.lit(width))
    return (expanded
            .withColumn("rank", rank)
            .where((F.col("cum") >= F.col("rank"))
                   & (F.col("cum") - F.col("cnt") < F.col("rank")))
            .select(*group_cols,
                    F.round(F.col("q") * F.lit(1e7)).cast("long").alias("q7"),
                    "rank", "bin",
                    F.round(est * F.lit(1e7)).cast("long").alias("est7")))


def hist_sketch_sql(src_cte: str, value_expr: str, group_cols: list[str],
                    lo: float, hi: float, bins: int) -> str:
    """DuckDB twin of hist_sketch (SELECT body over ``src_cte``)."""
    gpfx = ", ".join(group_cols) + ", " if group_cols else ""
    gby = "GROUP BY " + ", ".join(group_cols + ["bin"]) if group_cols \
        else "GROUP BY bin"
    raw = (f"CAST(floor((CAST({value_expr} AS DOUBLE) "
           f"- CAST({float(lo)!r} AS DOUBLE)) "
           f"/ CAST({float(hi - lo)!r} AS DOUBLE) * {bins}) AS BIGINT)")
    return f"""
  SELECT {gpfx}bin, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT {gpfx}CAST(least(greatest({raw}, 0), {bins - 1}) AS INT) AS bin
    FROM {src_cte} WHERE {value_expr} IS NOT NULL
  ) {gby}"""


def hist_quantiles_sql(registers_cte: str, qs: list[float],
                       group_cols: list[str],
                       lo: float, hi: float, bins: int) -> str:
    """DuckDB twin of hist_quantiles over ``registers_cte``."""
    gsel = ", ".join(group_cols)
    gpfx = gsel + ", " if gsel else ""
    part = f"PARTITION BY {gsel} " if gsel else ""
    width = float(hi - lo) / bins
    qlist = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in sorted(qs))
    est = (f"CAST({float(lo)!r} AS DOUBLE) + (CAST(bin AS DOUBLE) "
           f"+ CAST(rank - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)) "
           f"* CAST({width!r} AS DOUBLE)")
    return f"""
  SELECT {gpfx}CAST(round(q * 1e7) AS BIGINT) AS q7, rank, bin,
         CAST(round(({est}) * 1e7) AS BIGINT) AS est7
  FROM (
    SELECT *, greatest(CAST(ceil(q * n) AS BIGINT), 1) AS rank FROM (
      SELECT {gpfx}bin, cnt,
             CAST(sum(cnt) OVER ({part}ORDER BY bin) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER ({part.rstrip() or ''}) AS BIGINT) AS n
      FROM {registers_cte}
    ), (SELECT unnest([{qlist}]) AS q)
  )
  WHERE cum >= rank AND cum - cnt < rank"""


# ---------------------------------------------------------------------------
# Hierarchical HLL pyramid — sketch algebra composed with the tile
# pyramid: distinct-count-per-cell at EVERY zoom level, each coarser
# level built by merging the previous level's registers (max), never
# rescanning the data.
# ---------------------------------------------------------------------------

def cell_hll_pyramid(df: DataFrame, key_col: str, cell_col: str = "cell",
                     levels: int = 2, p: int = DEFAULT_P) -> DataFrame:
    """Distinct-count estimates per cell at the native resolution
    (level 0) and ``levels`` coarser parents: (cell, level, n_regs,
    ind_sum, est).

    The tile-server question "how many distinct pages in this tile at
    every zoom" is exact-count-impossible at 100 TB (distinct does not
    roll up), but HLL registers DO: level k+1's registers are
    max-merges of level k's (<= m rows per cell), so the raw data
    shuffles exactly once and every coarser level is a geometrically
    shrinking register hash-agg — the cell_pyramid shape
    (spark_joins.cell_pyramid) lifted from counts to sketches."""
    if levels < 0:
        raise ValueError(f"levels must be >= 0, got {levels}")
    from .spark_joins import cell_parent_col
    regs = hll_sketch(df, key_col, [cell_col], p)
    out = (hll_estimate(regs, [cell_col], p)
           .withColumn("level", F.lit(0)))
    for k in range(1, levels + 1):
        regs = (regs.groupBy(cell_parent_col(F.col(cell_col), 1)
                             .alias(cell_col), "reg")
                .agg(F.max("rho").alias("rho")))
        out = out.unionByName(
            hll_estimate(regs, [cell_col], p).withColumn("level", F.lit(k)))
    return out.select(cell_col, "level", "n_regs", "ind_sum", "est")


def cms_join_size(left_sketch: DataFrame,
                  right_sketch: DataFrame) -> DataFrame:
    """Join-cardinality estimate |A JOIN B ON key| from two Count-Min
    sketches built with the SAME depth/width/key hashing (Cormode &
    Muthukrishnan 2005 inner-product estimator): for each hash row j,
    Sigma_b cntA[j][b] * cntB[j][b] upper-bounds the true join size;
    the estimate is the MIN over rows.  Returns one row
    (est long, rows array<long> of the per-row inner products).

    This is the planner's question — 'how big is this join' — answered
    from two bounded register tables without touching either input:
    the inner product joins depth*width-row sketches on (row, bucket)
    and folds with exact integer arithmetic, so the DuckDB twin
    matches bit-for-bit.  Guarantee: est >= true join size, and
    est <= true + e/width * |A|*|B| with prob 1 - e^-depth."""
    j = (left_sketch.select("row", "bucket",
                            F.col("cnt").alias("cnt_a"))
         .join(right_sketch.select("row", "bucket",
                                   F.col("cnt").alias("cnt_b")),
               ["row", "bucket"])
         .groupBy("row")
         .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip")))
    # depth is small: the fold over per-row inner products is a tiny
    # all-rows aggregate (missing rows would mean an empty sketch side)
    return (j.agg(F.min("ip").alias("est"),
                  F.sort_array(F.collect_list("ip")).alias("rows"))
            .select(F.col("est").cast("long"), "rows"))
