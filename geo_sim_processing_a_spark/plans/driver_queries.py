"""The driver-contract query battery (__spark_entry__.py).

Each entry: a Spark DataFrame builder (spark, sf_dir) -> DataFrame and,
where ANSI-SQL-expressible, a DuckDB oracle string over the same
parquet views.  Column names/aliases match EXACTLY between the two
(the driver hash-compares values after sorting columns by name).

Float discipline for hash-compared queries: every float output column
is rounded to 6 decimals on BOTH sides with identical expression
order, and all tie-breaks are by an id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# session-scoped scratch dirs (one per (query, sf_dir) per process)
_SCRATCH_DIRS: dict = {}


# ---------------------------------------------------------------------------
# relational / aggregate / window (SURVEY.md §2.7-2.8 engine surface)
# ---------------------------------------------------------------------------

def _dsum(col, scale: int = 6):
    """Order-independent float sum: the per-row double expression is
    cast to an exact decimal (deterministic rounding of the binary
    value), summed EXACTLY (decimal addition is associative, so
    partial-aggregation order can't change the result), cast back and
    rounded.  A plain double sum diverged from the DuckDB oracle in the
    6th decimal at sf0.1 (q05's biggest groups) purely from summation
    order; cross-engine cast agreement is pinned by the sf0.1 artifact
    and the same DECIMAL(28,8) expression in every SQL twin."""
    return F.round(F.sum(col.cast("decimal(28,8)")).cast("double"), scale)


def _sql_dsum(expr: str, alias: str, scale: int = 6) -> str:
    return (f"round(CAST(sum(CAST({expr} AS DECIMAL(28,8))) AS DOUBLE), "
            f"{scale}) AS {alias}")


def q01_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (l.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
                 _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
                 _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


SQL_Q01 = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       {_sql_dsum("l_extendedprice", "sum_base_price")},
       {_sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q03_order_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (c.where(F.col("c_mktsegment") == "BUILDING")
            .join(o, c.c_custkey == o.o_custkey)
            .join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderkey")
            .limit(20))


SQL_Q03 = f"""
SELECT o_orderkey, o_orderdate,
       {_sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""


def q05_nation_volume(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    return (l.join(s, l.l_suppkey == s.s_suppkey)
            .join(n, s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy("r_name", "n_name"))


SQL_Q05 = f"""
SELECT r_name, n_name,
       {_sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_window_top_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (o.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("o_custkey", "o_orderkey", F.round("o_totalprice", 6).alias("price"),
                    F.col("rnk").cast("long").alias("rnk")))


SQL_WINDOW_TOP = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS price, rnk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
WHERE rnk <= 3
"""


def q_supplier_rank(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    rev = (l.join(s, l.l_suppkey == s.s_suppkey)
           .groupBy("s_nationkey", "s_suppkey")
           .agg(_dsum(F.col("l_extendedprice")).alias("revenue")))
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("revenue"), "s_suppkey")
    return (rev.withColumn("rnk", F.dense_rank().over(w))
            .where(F.col("rnk") <= 2)
            .select(F.col("s_nationkey").cast("long").alias("s_nationkey"),
                    "s_suppkey", "revenue", F.col("rnk").cast("long").alias("rnk")))


SQL_SUPPLIER_RANK = f"""
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, s_suppkey, revenue, rnk
FROM (SELECT s_nationkey, s_suppkey, revenue,
             dense_rank() OVER (PARTITION BY s_nationkey
                                ORDER BY revenue DESC, s_suppkey) AS rnk
      FROM (SELECT s_nationkey, s_suppkey,
                   {_sql_dsum("l_extendedprice", "revenue")}
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey, s_suppkey) r) t
WHERE rnk <= 2
"""


def q_events_by_type_day(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.count("*").alias("n"),
                 _dsum(F.col("value")).alias("total_value"))
            .orderBy("event_type", "day"))


SQL_EVENTS_DAY = f"""
SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
       {_sql_dsum("value", "total_value")}
FROM events
GROUP BY event_type, CAST(ts AS DATE)
ORDER BY event_type, day
"""


def q_events_sessions(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROSECOND-exact gap (timestampdiff works on TIMESTAMP_NTZ) to
    # match the oracle's fractional epoch() comparison —
    # unix_timestamp() truncates to whole seconds, so a 1800.4 s gap
    # would not start a session in Spark but would in DuckDB
    return (e.withColumn("_lag", F.lag("ts").over(w))
            .withColumn("gap_us", F.expr("timestampdiff(MICROSECOND, _lag, ts)"))
            .withColumn("new_session",
                        F.when(F.col("_lag").isNull()
                               | (F.col("gap_us") > 1800 * 1_000_000), 1)
                        .otherwise(0))
            .groupBy("user_id")
            .agg(F.sum("new_session").cast("long").alias("n_sessions"),
                 F.count("*").alias("n_events"))
            .orderBy("user_id"))


SQL_EVENTS_SESSIONS = """
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM (SELECT user_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events) t
GROUP BY user_id
ORDER BY user_id
"""


def q_hypertable_rollup(spark, sf_dir):
    """Hypertable rollup: incrementally-refreshed hourly continuous
    aggregate over events, materialized per-bucket with dynamic
    partition overwrite; the READ-BACK materialization is what gets
    hash-compared to the direct SQL aggregate.

    CONSUME-IMMEDIATELY CONTRACT (ADVICE r4): the returned DataFrame is
    a lazy read over a session-scoped scratch dir that a LATER
    invocation's refresh() rewrites with dynamic partition overwrite —
    execute (collect/write) it before calling this query again in the
    same process, or the held plan can hit deleted-file errors /
    mixed-generation reads.  The driver harness and bench both consume
    eagerly; callers wanting a durable handle should pass their own
    out_dir to the operator and snapshot (e.g. localCheckpoint)."""
    import atexit
    import shutil
    import tempfile
    from ..operators.hypertable import read_rollup, refresh
    e = _t(spark, sf_dir, "events")
    # local-mode scratch: the operator itself takes a caller-provided
    # shared out_dir on a real cluster.  The read-back is returned LAZY
    # (no toPandas driver round-trip — on a 100 TB event table the
    # bucket x type cardinality is unbounded).  Scratch is SESSION-
    # SCOPED and reused across invocations (one dir + one atexit hook
    # per process, keyed per sf_dir) so a long-lived driver calling the
    # query repeatedly — bench retry loops, verify sweeps — does not
    # accumulate unbounded /tmp dirs; refresh() overwrites per-bucket.
    key = ("rollup_q", sf_dir)
    out = _SCRATCH_DIRS.get(key)
    if out is None:
        out = tempfile.mkdtemp(prefix="rollup_q_")
        _SCRATCH_DIRS[key] = out
        atexit.register(shutil.rmtree, out, ignore_errors=True)
    refresh(spark, e, out, time_col="ts", bucket="hour")
    return (read_rollup(spark, out)
            .select(F.date_format("bucket", "yyyy-MM-dd HH:00:00").alias("bucket"),
                    "event_type", "n_events", "total_value", "avg_value")
            .orderBy("bucket", "event_type"))


SQL_HYPERTABLE_ROLLUP = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS bucket,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE), 6) AS total_value,
       round(CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) / count(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
"""


def q_lang_dist(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang", "source")
            .agg(F.count("*").alias("n"), F.round(F.avg("n_chars"), 6).alias("avg_chars"))
            .orderBy("lang", "source"))


SQL_LANG_DIST = """
SELECT lang, source, count(*) AS n, round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


def q_ngram_topk(spark, sf_dir):
    """Corpus top-50 word trigrams (vocab/contamination/boilerplate
    statistics; operators/text.py ngram_topk).  Explode is pipelined in
    the scan stage; the only shuffle is one partial+final hash-agg on
    the gram; top-k is TakeOrdered, never a full sort."""
    from ..operators.text import ngram_topk
    return ngram_topk(_t(spark, sf_dir, "documents"), n=3, k=50)


SQL_NGRAM_TOPK = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT array_to_string(t[i:i+2], ' ') AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
)
SELECT gram, count(*) AS n FROM grams
GROUP BY gram ORDER BY n DESC, gram LIMIT 50
"""


def q_doc_split(spark, sf_dir):
    """Deterministic content-addressed train/valid/test split counts
    per language (operators/sampling.py).  The split is a pure function
    of md5(text) — reproducible on any engine at any scale, stable
    under repartitioning, no shuffle beyond the final tiny agg."""
    from ..operators.sampling import deterministic_split
    d = deterministic_split(_t(spark, sf_dir, "documents"))
    return (d.groupBy("split", "lang")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("n_chars"), 6).alias("avg_chars"))
            .orderBy("split", "lang"))


SQL_DOC_SPLIT = """
WITH b AS (SELECT lang, n_chars,
                  ('0x' || substr(md5(text), 1, 3))::UBIGINT AS bucket
           FROM documents)
SELECT CASE WHEN bucket < 409 THEN 'test'
            WHEN bucket < 818 THEN 'valid'
            ELSE 'train' END AS split,
       lang, count(*) AS n, round(avg(n_chars), 6) AS avg_chars
FROM b GROUP BY 1, 2 ORDER BY split, lang
"""


def q_domain_mix(spark, sf_dir):
    """Deterministic training-mixture reweighting: downsample three
    sources to target fractions (content-addressed md5 buckets —
    operators/sampling.py), keep the rest; per-source surviving counts."""
    from ..operators.sampling import domain_mix
    d = _t(spark, sf_dir, "documents")
    mixed = domain_mix(d, {"src0": 0.5, "src1": 0.25, "src2": 0.0})
    return (mixed.groupBy("source").agg(F.count("*").alias("n"))
            .orderBy("source"))


SQL_DOMAIN_MIX = """
SELECT source, count(*) AS n
FROM documents
WHERE ('0x' || substr(md5(text), 1, 3))::UBIGINT <
      CASE WHEN source = 'src2' THEN 0
           WHEN source = 'src1' THEN 1024
           WHEN source = 'src0' THEN 2048
           ELSE 4096 END
GROUP BY source ORDER BY source
"""


def q_curation(spark, sf_dir):
    """The full curation pipeline in one oracle-verified composition
    (operators/curation.py): exact dedup -> length + repetition quality
    filter -> deterministic split; per-(split, lang) survivor stats."""
    from ..operators.curation import curate_corpus
    d = _t(spark, sf_dir, "documents")
    return (curate_corpus(d)
            .groupBy("split", "lang")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("n_tokens"), 6).alias("avg_tokens"))
            .orderBy("split", "lang"))


def _sql_rep_stats(src_cte: str, text_col: str) -> str:
    """Shared ``rep_stats`` CTE — per-doc top-trigram share, rounded
    EXACTLY like repetition_stats' top_share output so a <= threshold
    filter compares the same value in both engines (an unrounded oracle
    filter would diverge on shares in (0.12, 0.1200005)).  One
    definition shared by the exact-curation and web-curation twins."""
    return f"""rep_stats AS (
  SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_share
  FROM (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g, count(*) AS c
        FROM (SELECT doc_id, string_split({text_col}, ' ') AS t
              FROM {src_cte}),
             UNNEST(generate_series(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 3 GROUP BY doc_id, g) pg2
  GROUP BY doc_id)"""


def _sql_split_case(content_col: str) -> str:
    """Shared deterministic-split expression (sampling.md5_bucket twin:
    nibbles=3, 10%/10% -> test < 409, valid < 818 of 4096)."""
    b = f"('0x' || substr(md5({content_col}), 1, 3))::UBIGINT"
    return (f"CASE WHEN {b} < 409 THEN 'test' "
            f"WHEN {b} < 818 THEN 'valid' ELSE 'train' END")


SQL_CURATION = """
WITH reps AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY md5(text)
                                              ORDER BY doc_id) AS rn
                 FROM documents) WHERE rn = 1),
toks AS (SELECT doc_id, lang, text,
                len(string_split(text, ' ')) AS n_tokens FROM reps),
""" + _sql_rep_stats("toks", "text") + """,
kept AS (
  SELECT t.*
  FROM toks t JOIN rep_stats USING (doc_id)
  WHERE n_tokens >= 20 AND top_share <= 0.12)
SELECT """ + _sql_split_case("text") + """ AS split,
       lang, count(*) AS n, round(avg(n_tokens), 6) AS avg_tokens
FROM kept GROUP BY 1, 2 ORDER BY split, lang
"""


def q_tfidf_keywords(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (text.tfidf_keywords):
    scan-stage tokenize-explode, two partial-aggregated hash-aggs,
    one term equi-join, bounded per-doc window; scores rounded before
    ranking so the tie-break is engine-exact."""
    from ..operators.text import tfidf_keywords
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_keywords(d, k=3).orderBy("doc_id", "rnk")


SQL_TFIDF_KEYWORDS = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')) AS term
  FROM documents
), t2 AS (
  SELECT doc_id, term FROM toks WHERE term != ''
), td AS (
  SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM td GROUP BY term
), scored AS (
  SELECT td.doc_id, td.term, td.tf, dft.df,
         round(td.tf * ln((SELECT count(*) FROM documents) * 1.0 / dft.df),
               6) AS score
  FROM td JOIN dft USING (term)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, score, rnk FROM ranked
WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style bigram-LM quality gate (operators/lm.py): train an
    add-k bigram LM on the documents corpus, score each doc's
    cross-entropy, bucket head/middle/tail.  Tokenize-explode in the
    scan stage, lag window for bigram formation, hash-agg count
    tables, broadcast vocab joins; zero UDF.  Log-probs are
    integer-quantized (1e-7) before summation so the per-doc sum is
    order-independent and hash-exact vs the DuckDB twin."""
    from ..operators.lm import bigram_lm_score, perplexity_buckets
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scores = bigram_lm_score(d, min_count=2, k=0.1)
    return (perplexity_buckets(scores, head_ce=LM_HEAD_CE, tail_ce=LM_TAIL_CE)
            .orderBy("doc_id"))


LM_HEAD_CE = 3.38
LM_TAIL_CE = 3.4

SQL_LM_PERPLEXITY = r"""
WITH toks0 AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')) AS term,
         generate_subscripts(string_split_regex(trim(text),
                                                '[ \t\n\x0b\f\r]+'), 1) AS pos
  FROM documents
), toks AS (
  SELECT * FROM toks0 WHERE term != ''
), vocab AS (
  SELECT term FROM toks GROUP BY term HAVING count(*) >= 2
), nv AS (
  SELECT count(*) AS v FROM vocab
), pr AS (
  SELECT doc_id,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS v_raw,
         term AS w_raw
  FROM toks
), pairs AS (
  SELECT pr.doc_id,
         CASE WHEN va.term IS NOT NULL THEN pr.v_raw ELSE '<unk>' END AS v,
         CASE WHEN vb.term IS NOT NULL THEN pr.w_raw ELSE '<unk>' END AS w
  FROM pr
  LEFT JOIN vocab va ON pr.v_raw = va.term
  LEFT JOIN vocab vb ON pr.w_raw = vb.term
  WHERE pr.v_raw IS NOT NULL
), pdv AS (
  SELECT doc_id, v, w, count(*) AS m FROM pairs GROUP BY doc_id, v, w
), bi AS (
  SELECT v, w, sum(m) AS c_vw FROM pdv GROUP BY v, w
), ctx AS (
  SELECT v, sum(c_vw) AS c_v FROM bi GROUP BY v
), sc AS (
  SELECT pdv.doc_id, pdv.m,
         CAST(round(ln((bi.c_vw + 0.1)
                       / (ctx.c_v + 0.1 * ((SELECT v FROM nv) + 1))) * 1e7)
              AS BIGINT) AS logp7
  FROM pdv JOIN bi USING (v, w) JOIN ctx USING (v)
), agg AS (
  SELECT doc_id, sum(m) AS n_bigrams,
         round(-sum(m * logp7) / (1e7 * sum(m)), 6) AS ce
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_bigrams, ce,
       CASE WHEN ce <= 3.38 THEN 'head'
            WHEN ce <= 3.4 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM agg ORDER BY doc_id
"""


def q_dup_spans(spark, sf_dir):
    """Duplicate-substring spans (operators/spans.py — ExactSubstr of
    Lee et al. 2021, Spark-native): positions whose 5-token window
    repeats corpus-wide, merged to maximal spans via the
    gaps-and-islands window.  Gram counting shuffles the 12-byte
    (xxhash64, length) key; the DuckDB twin groups the gram string
    itself, so a hash collision would surface as a hash-mismatch
    here — the oracle doubles as the standing collision check."""
    from ..operators.spans import duplicate_spans
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (duplicate_spans(d, k=5, min_occurrences=2)
            .orderBy("doc_id", "span_id"))


SQL_DUP_SPANS = r"""
WITH lists AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text),
                                                '[ \t\n\x0b\f\r]+'),
                             x -> x != '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(l[i:i+4], ' ') AS gram
  FROM lists, unnest(generate_series(1, greatest(len(l) - 4, 0))) AS t(i)
), hot AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
), dup AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN hot USING (gram)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL THEN 1
              WHEN pos > lag(pos) OVER w + 5 THEN 1 ELSE 0 END AS new_span
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), sp AS (
  SELECT doc_id, pos,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
)
SELECT doc_id, span_id, min(pos) AS start_pos, max(pos) + 4 AS end_pos,
       max(pos) + 4 - min(pos) + 1 AS n_tokens
FROM sp GROUP BY doc_id, span_id ORDER BY doc_id, span_id
"""


PR_M = 64          # synthetic host-graph node count
PR_ITERS = 10


def _pr_hb(salt: str, mod: int):
    """Deterministic host bucket from doc_id (md5_bucket idiom, twin
    of the DuckDB expression in _sql_pagerank)."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt),
                       F.col("doc_id").cast("string")).cast("binary")),
        1, 4), 16, 10).cast("long") % mod)


def q_pagerank(spark, sf_dir):
    """Domain-authority PageRank (operators/graph.pagerank): a
    deterministic synthetic host graph (two out-links per document,
    md5-derived in BOTH engines — the q_url_normalize synth precedent)
    ranked with 10 integer-quantized iterations.  All-integer
    arithmetic means the DuckDB twin — the same 10 iterations unrolled
    as chained CTEs — reproduces every rank to the last 1e-12 unit."""
    from ..operators.graph import pagerank
    d = _t(spark, sf_dir, "documents").select("doc_id")
    e = (d.select(_pr_hb("s", PR_M).alias("src"),
                  _pr_hb("a", PR_M).alias("dst"))
         .union(d.select(_pr_hb("s", PR_M).alias("src"),
                         _pr_hb("b", PR_M).alias("dst"))))
    return pagerank(e, n_iter=PR_ITERS).orderBy("node")


def _sql_pagerank(n_iter: int = PR_ITERS, m: int = PR_M) -> str:
    from ..operators.graph import PR_SCALE

    def hb(salt):
        return (f"CAST(('0x' || substr(md5('{salt}' || doc_id::VARCHAR),"
                f" 1, 4))::UBIGINT % {m} AS BIGINT)")

    sql = [f"""
WITH raw_e AS (
  SELECT {hb('s')} AS src, {hb('a')} AS dst FROM documents
  UNION ALL
  SELECT {hb('s')} AS src, {hb('b')} AS dst FROM documents
), edges AS (
  SELECT DISTINCT src, dst FROM raw_e WHERE src != dst
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION SELECT DISTINCT dst FROM edges
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY src
), nv AS (SELECT count(*) AS n FROM nodes),
it0 AS (
  SELECT node, CAST({PR_SCALE} // (SELECT n FROM nv) AS BIGINT) AS rank_q
  FROM nodes)"""]
    for i in range(1, n_iter + 1):
        sql.append(f""",
it{i} AS (
  SELECT n.node,
         CAST((15 * {PR_SCALE}) // (100 * (SELECT n FROM nv))
              + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank_q
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.rank_q // d.deg) AS s
    FROM edges e
    JOIN it{i - 1} p ON e.src = p.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst) c ON n.node = c.node)"""
                   )
    sql.append(f"\nSELECT node, rank_q FROM it{n_iter} ORDER BY node")
    return "".join(sql)


def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per event type (Spark SQL
    `percentile`, the Greenwald-Khanna-free exact path — both engines
    sort-and-interpolate identically; round(6) absorbs ulp noise).
    The scale path for sketched quantiles is approx_percentile; this
    query pins the EXACT semantics the sketch is judged against."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
                 F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"))
            .orderBy("event_type"))


SQL_VALUE_PERCENTILES = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_contamination(spark, sf_dir):
    """Benchmark-leakage screen: 5-gram contamination of every document
    against a deterministic ~2% 'benchmark' slice of the corpus (the
    md5-bucket test slice — in production this is an external benchmark
    table).  Probe grams broadcast; one shuffle (per-doc agg)."""
    from ..operators.sampling import md5_bucket
    from ..operators.text import ngram_contamination
    d = _t(spark, sf_dir, "documents")
    probes = d.where(md5_bucket(F.col("text")) < 82)
    return (ngram_contamination(d, probes, n=5)
            .orderBy("doc_id"))


def q_fuzzy_contamination(spark, sf_dir):
    """Per-(doc, probe) n-gram Jaccard decontamination
    (text.jaccard_contamination) against the same deterministic
    benchmark slice as q_contamination: broadcast-exact set overlap —
    no LSH recall risk for a small probe corpus.  Self-pairs (the
    probe slice is cut from the corpus) surface at jaccard 1.0, which
    is exactly what decontamination must find."""
    from ..operators.sampling import md5_bucket
    from ..operators.text import jaccard_contamination
    d = _t(spark, sf_dir, "documents")
    probes = (d.where(md5_bucket(F.col("text")) < 82)
              .select(F.col("doc_id").alias("probe_id"), "text"))
    return (jaccard_contamination(d, probes, n=5, threshold=0.2)
            .orderBy("doc_id", "probe_id"))


SQL_FUZZY_CONTAMINATION = """
WITH pg AS (
  SELECT DISTINCT doc_id AS probe_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE ('0x' || substr(md5(text), 1, 3))::UBIGINT < 82),
       UNNEST(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5
), pg_n AS (
  SELECT probe_id, count(*) AS n_probe FROM pg GROUP BY probe_id
), dg AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       UNNEST(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5
), dg_n AS (
  SELECT doc_id, count(*) AS n_doc FROM dg GROUP BY doc_id
), inter AS (
  SELECT dg.doc_id, pg.probe_id, count(*) AS n_inter
  FROM dg JOIN pg USING (gram)
  GROUP BY dg.doc_id, pg.probe_id
)
SELECT i.doc_id, i.probe_id, d.n_doc, p.n_probe, i.n_inter,
       round(i.n_inter * 1.0 / (d.n_doc + p.n_probe - i.n_inter), 6)
         AS jaccard
FROM inter i
JOIN dg_n d ON i.doc_id = d.doc_id
JOIN pg_n p ON i.probe_id = p.probe_id
WHERE round(i.n_inter * 1.0 / (d.n_doc + p.n_probe - i.n_inter), 6) >= 0.2
ORDER BY i.doc_id, i.probe_id
"""


SQL_CONTAMINATION = """
WITH probe AS (
  SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS gram
  FROM (SELECT string_split(text, ' ') AS t FROM documents
        WHERE ('0x' || substr(md5(text), 1, 3))::UBIGINT < 82),
       UNNEST(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5),
dg AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       UNNEST(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN p.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       round(sum(CASE WHEN p.gram IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS frac
FROM dg LEFT JOIN probe p USING (gram)
GROUP BY doc_id ORDER BY doc_id
"""


def q_repetition(spark, sf_dir):
    """Gopher-style repetition quality rule: per-doc share of the most
    frequent trigram.  Two partial-aggregated hash-aggs, no UDF."""
    from ..operators.text import repetition_stats
    return repetition_stats(_t(spark, sf_dir, "documents"), n=3).orderBy("doc_id")


SQL_REPETITION = """
WITH dg AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       UNNEST(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3),
pg AS (SELECT doc_id, gram, count(*) AS c FROM dg GROUP BY doc_id, gram)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams, max(c) AS top_gram_n,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_share
FROM pg GROUP BY doc_id ORDER BY doc_id
"""


def q_rollup_revenue(spark, sf_dir):
    """ROLLUP aggregate (multi-level totals in one pass — the engine
    surface for hierarchical rollups).  Group keys are coalesced to a
    sentinel so cross-engine null ordering never matters."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.rollup("l_returnflag", "l_linestatus")
            .agg(_dsum(F.col("l_extendedprice")).alias("revenue"),
                 F.count("*").alias("n"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                    "revenue", "n")
            .orderBy("rf", "ls"))


SQL_ROLLUP_REVENUE = f"""
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       {_sql_dsum("l_extendedprice", "revenue")},
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY rf, ls
"""


def q_customers_without_orders(spark, sf_dir):
    """Anti-join / EXCEPT surface: customers with no URGENT order
    (the urgent-order predicate keeps the expected output non-empty at
    every test SF — a 0-row result would be evidence of nothing)."""
    c = _t(spark, sf_dir, "customer")
    o = (_t(spark, sf_dir, "orders")
         .where(F.col("o_orderpriority") == "1-URGENT"))
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_mktsegment")
            .orderBy("c_custkey"))


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# dedup / text analysis (operators/dedup.py, operators/text.py)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from ..operators.dedup import exact_dedup
    return (exact_dedup(_t(spark, sf_dir, "documents"))
            .orderBy("text_md5"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id, count(*) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY text_md5
"""


def q_fingerprint(spark, sf_dir):
    from ..operators.text import fingerprint
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


SQL_FINGERPRINT = """
SELECT doc_id, md5(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')))) AS fp
FROM documents ORDER BY doc_id
"""


def q_text_features(spark, sf_dir):
    from ..operators.text import lang_id, quality_score, token_count
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return (d.select("doc_id",
                     lang_id(c).alias("lang_pred"),
                     token_count(c).cast("long").alias("n_tokens"),
                     quality_score(c).alias("quality"))
            .orderBy("doc_id"))


def _sql_marker_hits(words):
    # mirror operators/text._marker_hits exactly: integer occurrence
    # count per word (length delta / chars-removed-per-hit, which is
    # len(w)+1 and divides exactly), summed as integers
    terms = []
    for w in words:
        hay = f" {w} "
        terms.append(
            f"CAST((length(padded) - length(replace(padded, '{hay}', ' ')))"
            f" / {len(hay) - 1} AS INT)")
    return " + ".join(terms)


def _sql_text_features():
    from ..operators.text import LANG_MARKERS
    score_cols = ",\n       ".join(
        f"({_sql_marker_hits(ws)}) AS score_{lang}"
        for lang, ws in sorted(LANG_MARKERS.items()))
    langs = sorted(LANG_MARKERS)
    # argmax with strict > in sorted-language order (same as Spark fold)
    best_expr = "0"
    pick = "'und'"
    for lang in langs:
        pick = (f"CASE WHEN score_{lang} > greatest({best_expr}) "
                f"THEN '{lang}' ELSE ({pick}) END")
        best_expr = best_expr + f", score_{lang}"
    return f"""
WITH base AS (
  SELECT doc_id, text, concat(' ', lower(text), ' ') AS padded FROM documents
), scored AS (
  SELECT doc_id, text,
       {score_cols}
  FROM base
), tok AS (
  SELECT doc_id, text,
         {pick} AS lang_pred,
         len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) AS n_tokens,
         length(regexp_replace(text, '[\\w \\t\\n\\x0b\\f\\r]', '', 'g'))
           / greatest(length(text), 1) AS punct,
         length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g'))
           / greatest(len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')), 1) AS wl
  FROM scored
)
SELECT doc_id, lang_pred, n_tokens,
       round(least(length(text)/500.0, 1.0) * 0.5
             + (1.0 - least(punct * 4.0, 1.0)) * 0.25
             + (CASE WHEN wl >= 3.0 AND wl <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.25,
             6) AS quality
FROM tok
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# cell encode / stats (operators/cells.py; morton unrolled in SQL)
# ---------------------------------------------------------------------------

CELL_RES = 12

_PTS_CUST = """
  SELECT c_custkey AS pid,
         (c_custkey * 7919 % 360000) / 1000.0 - 180 AS lon,
         (c_custkey * 104729 % 170000) / 1000.0 - 85 AS lat
  FROM customer
"""


def _points_from_customer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") * 7919 % 360000) / 1000.0 - 180).alias("lon"),
        ((F.col("c_custkey") * 104729 % 170000) / 1000.0 - 85).alias("lat"))


def q_token_stats(spark, sf_dir):
    """Token counting both ways (task brief): whitespace tokens and
    BPE-ish regex pre-tokenization units, hash-verified vs DuckDB."""
    from ..operators.text import bpe_token_count, token_count
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return (d.select("doc_id",
                     token_count(c).cast("long").alias("n_ws_tokens"),
                     bpe_token_count(c).cast("long").alias("n_bpe_tokens"))
            .orderBy("doc_id"))


SQL_TOKEN_STATS = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]'))
           AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def q_winnow_near_dup(spark, sf_dir):
    """Rolling-hash (winnowing) document fingerprints -> near-dup
    candidate pairs by shared fingerprints (explode + equi-join, never
    all-pairs)."""
    from ..operators.text import winnow_near_dup_pairs
    d = _t(spark, sf_dir, "documents")
    # k=16/w=32 so the short-word synthetic vocabulary doesn't produce
    # indiscriminate k-gram collisions (k=8 matched 36k pairs; these
    # params match the MinHash near-dup scale on the same table)
    return (winnow_near_dup_pairs(d, k=16, w=32, min_shared=8,
                                  hot_key_cap=1000)  # guard ON in the
            # driver/bench path (raw API default is now opt-in)
            .orderBy("id_a", "id_b"))


def q_cell_encode(spark, sf_dir):
    from ..operators.spark_joins import encode_cell_udf
    pts = _points_from_customer(spark, sf_dir)
    enc = encode_cell_udf(CELL_RES)
    return pts.select("pid", enc("lon", "lat").alias("cell")).orderBy("pid")


def _sql_morton_cell(res: int) -> str:
    n = 1 << res
    return f"""
WITH pts AS ({_PTS_CUST}),
g AS (
  SELECT pid,
    least(greatest(CAST(floor(((lon + 180) / 360.0) * {n}) AS BIGINT), 0), {n - 1}) AS ix,
    least(greatest(CAST(floor(((lat + 90) / 180.0) * {n}) AS BIGINT), 0), {n - 1}) AS iy
  FROM pts
),
s1 AS (SELECT pid, (ix | (ix << 16)) & 281470681808895 AS x,
                   (iy | (iy << 16)) & 281470681808895 AS y FROM g),
s2 AS (SELECT pid, (x | (x << 8)) & 71777214294589695 AS x,
                   (y | (y << 8)) & 71777214294589695 AS y FROM s1),
s3 AS (SELECT pid, (x | (x << 4)) & 1085102592571150095 AS x,
                   (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
s4 AS (SELECT pid, (x | (x << 2)) & 3689348814741910323 AS x,
                   (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
s5 AS (SELECT pid, (x | (x << 1)) & 6148914691236517205 AS x,
                   (y | (y << 1)) & 6148914691236517205 AS y FROM s4)
SELECT pid, (((x | (y << 1)) << 5) | {res}) AS cell FROM s5
"""


SQL_CELL_ENCODE = _sql_morton_cell(CELL_RES) + " ORDER BY pid"


def q_cell_stats(spark, sf_dir):
    return (q_cell_encode(spark, sf_dir)
            .groupBy("cell").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "cell").limit(50))


SQL_CELL_STATS = (
    "WITH cells AS (" + _sql_morton_cell(CELL_RES) + ")\n"
    "SELECT cell, count(*) AS n FROM cells GROUP BY cell "
    "ORDER BY n DESC, cell LIMIT 50")


def q_cell_pyramid(spark, sf_dir):
    """Multi-resolution rollup pyramid: per-cell counts at res 12 plus
    two coarser parent levels — hierarchical reaggregation (level k+1
    aggregates level k's output, the raw rows shuffle exactly once)."""
    from ..operators.spark_joins import cell_pyramid
    # n emitted as double: the twin's sum(n) is a DuckDB HUGEINT, which
    # lands in the driver's canon frame as float64 (the r5 red class —
    # 2 vs 2.0 diverges under a raw-value hash); values are identical
    return (cell_pyramid(q_cell_encode(spark, sf_dir), levels=2)
            .select("cell", F.col("n").cast("double").alias("n"), "level")
            .orderBy("level", "cell"))


_SQL_PARENT = "((cell >> 7) << 5) | ((cell & 31) - 1)"

SQL_CELL_PYRAMID = (
    "WITH cells AS (" + _sql_morton_cell(CELL_RES) + "),\n"
    "l0 AS (SELECT cell, count(*) AS n FROM cells GROUP BY cell),\n"
    f"l1 AS (SELECT {_SQL_PARENT} AS cell, sum(n) AS n FROM l0 GROUP BY 1),\n"
    f"l2 AS (SELECT {_SQL_PARENT} AS cell, sum(n) AS n FROM l1 GROUP BY 1)\n"
    "SELECT cell, n, 0 AS level FROM l0\n"
    "UNION ALL SELECT cell, n, 1 AS level FROM l1\n"
    "UNION ALL SELECT cell, n, 2 AS level FROM l2\n"
    "ORDER BY level, cell")


# ---------------------------------------------------------------------------
# PIP join / kNN (generic kernels vs SQL oracles on boundary-safe data)
# ---------------------------------------------------------------------------

_PTS_ORDERS = """
  SELECT o_orderkey AS pid,
         (o_orderkey * 7919 % 20000) / 1000.0 - 10 + 0.0005 AS lon,
         (o_orderkey * 104729 % 20000) / 1000.0 - 10 + 0.0005 AS lat
  FROM orders
"""

_BOXES_NATION = """
  SELECT CAST(n_nationkey AS BIGINT) AS poly_id,
         (n_nationkey * 2311 % 18000) / 1000.0 - 9 AS cx,
         (n_nationkey * 1523 % 18000) / 1000.0 - 9 AS cy,
         0.5 + (n_nationkey % 7) / 10.0 AS w,
         0.5 + (n_nationkey % 5) / 10.0 AS h
  FROM nation
"""


def _points_from_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("pid"),
        ((F.col("o_orderkey") * 7919 % 20000) / 1000.0 - 10 + 0.0005).alias("lon"),
        ((F.col("o_orderkey") * 104729 % 20000) / 1000.0 - 10 + 0.0005).alias("lat"))


def _boxes_from_nation(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    b = n.select(
        F.col("n_nationkey").cast("long").alias("poly_id"),
        ((F.col("n_nationkey") * 2311 % 18000) / 1000.0 - 9).alias("cx"),
        ((F.col("n_nationkey") * 1523 % 18000) / 1000.0 - 9).alias("cy"),
        (0.5 + (F.col("n_nationkey") % 7) / 10.0).alias("w"),
        (0.5 + (F.col("n_nationkey") % 5) / 10.0).alias("h"))
    return b.select(
        "poly_id",
        F.array(F.col("cx") - F.col("w"), F.col("cx") + F.col("w"),
                F.col("cx") + F.col("w"), F.col("cx") - F.col("w"),
                F.col("cx") - F.col("w")).alias("xs"),
        F.array(F.col("cy") - F.col("h"), F.col("cy") - F.col("h"),
                F.col("cy") + F.col("h"), F.col("cy") + F.col("h"),
                F.col("cy") - F.col("h")).alias("ys"))


def q_pip_join(spark, sf_dir):
    from ..operators.spark_joins import pip_join
    pts = _points_from_orders(spark, sf_dir)
    boxes = _boxes_from_nation(spark, sf_dir)
    return (pip_join(pts, boxes, res=8)
            .select("pid", "poly_id").orderBy("pid", "poly_id"))


SQL_PIP_JOIN = f"""
WITH pts AS ({_PTS_ORDERS}), boxes AS ({_BOXES_NATION})
SELECT pid, poly_id
FROM pts, boxes
WHERE lon > cx - w AND lon < cx + w AND lat > cy - h AND lat < cy + h
ORDER BY pid, poly_id
"""


_BOXES_SUPPLIER = """
  SELECT CAST(s_suppkey AS BIGINT) AS b_id,
         (s_suppkey * 3571 % 18000) / 1000.0 - 9 AS cx,
         (s_suppkey * 2663 % 18000) / 1000.0 - 9 AS cy,
         0.4 + (s_suppkey % 6) / 10.0 AS w,
         0.4 + (s_suppkey % 4) / 10.0 AS h
  FROM supplier
"""


def _boxes_from_supplier(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    b = s.select(
        F.col("s_suppkey").cast("long").alias("b_id"),
        ((F.col("s_suppkey") * 3571 % 18000) / 1000.0 - 9).alias("cx"),
        ((F.col("s_suppkey") * 2663 % 18000) / 1000.0 - 9).alias("cy"),
        (0.4 + (F.col("s_suppkey") % 6) / 10.0).alias("w"),
        (0.4 + (F.col("s_suppkey") % 4) / 10.0).alias("h"))
    return b.select(
        "b_id",
        F.array(F.col("cx") - F.col("w"), F.col("cx") + F.col("w"),
                F.col("cx") + F.col("w"), F.col("cx") - F.col("w"),
                F.col("cx") - F.col("w")).alias("xs"),
        F.array(F.col("cy") - F.col("h"), F.col("cy") - F.col("h"),
                F.col("cy") + F.col("h"), F.col("cy") + F.col("h"),
                F.col("cy") - F.col("h")).alias("ys"))


def q_range_join(spark, sf_dir):
    """Spatial RANGE JOIN (bbox-overlap pairs) via grid-partitioned
    cell cover + reference-point dedup — candidates come from an
    equi-join on cell, never a cross join; hash-verified against the
    brute-force interval-overlap oracle."""
    from ..operators.spark_joins import range_join
    a = _boxes_from_nation(spark, sf_dir).withColumnRenamed("poly_id", "a_id")
    b = _boxes_from_supplier(spark, sf_dir)
    return (range_join(a, b, res=6)
            .orderBy("a_id", "b_id"))


SQL_RANGE_JOIN = f"""
WITH a AS ({_BOXES_NATION}), b AS ({_BOXES_SUPPLIER})
SELECT a.poly_id AS a_id, b.b_id
FROM a, b
WHERE a.cx - a.w <= b.cx + b.w AND a.cx + a.w >= b.cx - b.w
  AND a.cy - a.h <= b.cy + b.h AND a.cy + a.h >= b.cy - b.h
ORDER BY a_id, b_id
"""


def q_knn(spark, sf_dir):
    import math
    from ..operators.spark_joins import knn_join
    pts = _points_from_orders(spark, sf_dir).where(F.col("pid") % 8 == 0)
    # density-adaptive resolution: results are EXACT at any res (the
    # strict guard raises loudly if the k-th neighbor could escape
    # ring-1), so res only trades candidate volume.  r6 rule: from the
    # data's own extent + count, the expected k-th-neighbor distance is
    # r_k ~ sqrt(k*area/(pi*n)); pick the finest res whose cell height
    # keeps a 2.5x margin over r_k.  (The old 0.9*sqrt(n) heuristic
    # capped at res 8 and left ~4k candidates per refine group at
    # sf1.0 — 103 CPU-s of brute-force distances.)  n is footer-speed
    # (count on the bare table decodes no columns; pid % 8 keeps 1/8
    # of dense keys); the extent agg is a 4-scalar bounded collect.
    n = max(_t(spark, sf_dir, "orders").count() // 8, 1)
    ext = pts.agg(F.min("lon"), F.min("lat"),
                  F.max("lon"), F.max("lat")).collect()[0]
    area = max((ext[2] - ext[0]) * (ext[3] - ext[1]), 1e-9)
    r_k = math.sqrt(5 * area / (math.pi * n))
    res = max(2, min(12, int(math.log2(180.0 / (2.5 * r_k)))))
    salts = 8 if res <= 3 else 1
    return (knn_join(pts, k=5, res=res, n_query_salts=salts)
            .select("pid", "neighbor_id", F.col("rank").cast("long").alias("rank"))
            .orderBy("pid", "rank"))


SQL_KNN = f"""
WITH pts AS (SELECT * FROM ({_PTS_ORDERS}) WHERE pid % 8 = 0)
SELECT pid, neighbor_id, rank FROM (
  SELECT a.pid, b.pid AS neighbor_id,
         row_number() OVER (PARTITION BY a.pid ORDER BY
            (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat), b.pid) AS rank
  FROM pts a JOIN pts b ON a.pid <> b.pid) t
WHERE rank <= 5
ORDER BY pid, rank
"""


def q_embedding_topk(spark, sf_dir):
    from ..operators.similarity import brute_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")))
    return (brute_topk(emb, queries, k=5)
            .select("qid", "vec_id",
                    (F.col("cos") + F.lit(0.0)).alias("cos"),  # normalize -0.0
                    F.col("rank").cast("long").alias("rank"))
            .orderBy("qid", "rank"))


SQL_EMBEDDING_TOPK = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
           FROM embeddings WHERE vec_id % 100 = 0)
SELECT qid, vec_id, cos + 0.0 AS cos, rank FROM (
  SELECT q.qid, v.vec_id,
         round(list_dot_product(v.embedding::DOUBLE[], q.qvec)
               / greatest(sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec, q.qvec)), 1e-12), 6) AS cos,
         row_number() OVER (PARTITION BY q.qid ORDER BY
            list_dot_product(v.embedding::DOUBLE[], q.qvec)
               / greatest(sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec, q.qvec)), 1e-12) DESC, v.vec_id) AS rank
  FROM embeddings v, q) t
WHERE rank <= 5
ORDER BY qid, rank
"""


# ---------------------------------------------------------------------------
# geometry-kernel queries (non-SQL-expressible -> driver rows-only check)
# ---------------------------------------------------------------------------

def _geom_chk(*cols):
    """Deterministic per-row checksum of geometry/array columns —
    xxhash64 over the JSON encoding — so rows-only driver checks still
    pin the exact output values (vertex sequences included), not just
    row counts."""
    return F.xxhash64(F.to_json(F.struct(*cols)))


def _pages_from_documents(spark, sf_dir, limit=None):
    """Deterministic pages derived from the documents table's doc_ids."""
    from ..sources.pages import generate_pages_pdf
    import pandas as pd

    d = _t(spark, sf_dir, "documents").select("doc_id")
    if limit:
        d = d.where(F.col("doc_id") < limit)
    # the small documents parquet is ONE split: spread the Python page
    # synthesis (and everything fused downstream of it) across cores;
    # no-op at scale where the scan has >= cores splits
    from ..operators.dedup import _ensure_parallelism
    d = _ensure_parallelism(d)

    def gen(batches):
        for pdf in batches:
            yield generate_pages_pdf(pdf["doc_id"].to_numpy())

    from ..sources.spark_pages import PAGES_SCHEMA
    return d.mapInPandas(gen, PAGES_SCHEMA)


def q_reduce_bend_tiles(spark, sf_dir):
    """Flagship: per-tile Sherbend over geocoded page geometries
    (multi-ring polygons included).  ``chk`` pins the exact output
    vertex sequences per row."""
    from .pipeline import pages_to_covered_geoms, simplify_tiles
    from ..operators.tiling import salt_by_cell
    pages = _pages_from_documents(spark, sf_dir)
    covered = pages_to_covered_geoms(pages, res=6)
    salted = salt_by_cell(covered, target_rows_per_task=5000)
    out = simplify_tiles(salted, diameter_tol=0.004, kernel="sherbend")
    return (out.select("cell", "url", "kind", F.size("ring_offsets").alias("n_rings"),
                       "n_in", "n_out",
                       _geom_chk("xs", "ys", "ring_offsets").alias("chk"))
            .orderBy("cell", "url", "kind"))


def q_reduce_bend_smooth(spark, sf_dir):
    """Smoothing variant of the flagship at volume (B8 distributed):
    same tiles, smooth_line=True, smoothing counters exposed."""
    from .pipeline import pages_to_covered_geoms, simplify_tiles
    from ..operators.tiling import salt_by_cell
    pages = _pages_from_documents(spark, sf_dir)
    covered = pages_to_covered_geoms(pages, res=6)
    salted = salt_by_cell(covered, target_rows_per_task=5000)
    out = simplify_tiles(salted, diameter_tol=0.004, kernel="sherbend", smooth=True)
    return (out.select("cell", "url", "kind", "n_in", "n_out", "n_line_smooth",
                       _geom_chk("xs", "ys", "ring_offsets").alias("chk"))
            .orderBy("cell", "url", "kind"))


def q_dp_simplify(spark, sf_dir):
    from .pipeline import pages_to_covered_geoms, simplify_tiles
    pages = _pages_from_documents(spark, sf_dir)
    covered = pages_to_covered_geoms(pages, res=6)
    out = simplify_tiles(covered, diameter_tol=0.001, kernel="dp")
    return (out.select("cell", "url", "kind", "n_in", "n_out",
                       _geom_chk("xs", "ys", "ring_offsets").alias("chk"))
            .orderBy("cell", "url", "kind"))


def q_vw_simplify(spark, sf_dir):
    # 0.004 => VW area tolerance 1.6e-5, above the footprint bump
    # triangle areas (2.5e-6..1e-5) so polygon-ring simplification
    # visibly triggers (n_out < n_in) alongside the line work
    from .pipeline import pages_to_covered_geoms, simplify_tiles
    pages = _pages_from_documents(spark, sf_dir)
    covered = pages_to_covered_geoms(pages, res=6)
    out = simplify_tiles(covered, diameter_tol=0.004, kernel="vw")
    return (out.select("cell", "url", "kind", "n_in", "n_out",
                       _geom_chk("xs", "ys", "ring_offsets").alias("chk"))
            .orderBy("cell", "url", "kind"))


def q_chordal_axis(spark, sf_dir):
    """Skeleton GEOMETRY of the footprint polygons (tessellate +
    chordal axis with corrections, holes bridged) — real centre-line
    coordinates per part, matching the reference's skeleton sink
    (chordal_axis_algorithm.py:188-206), checksummed per row."""
    from .pipeline import pages_to_geoms
    from ..operators.skeleton import LAYER_SKELETON, chordal_axis_frame

    pages = _pages_from_documents(spark, sf_dir)
    # repartition breaks the synth->kernel mapInPandas CHAIN (two
    # Python workers per core otherwise — the pipeline.py fusion
    # lesson); only the kind==2 subset shuffles, and the kernel stage
    # gets its own full-parallel wave
    polys = (pages_to_geoms(pages).where(F.col("kind") == 2)
             .repartition(spark.sparkContext.defaultParallelism))
    frame = chordal_axis_frame(polys, correction=True)
    # polyline length JVM-side: sum of hypot over consecutive vertices
    idx = F.sequence(F.lit(1), F.greatest(F.size("xs") - 1, F.lit(0)))
    length = F.aggregate(
        F.when(F.size("xs") >= 2, idx).otherwise(F.array()),
        F.lit(0.0),
        lambda acc, i: acc + F.sqrt(
            F.pow(F.element_at(F.col("xs"), (i + 1).cast("int"))
                  - F.element_at(F.col("xs"), i.cast("int")), 2)
            + F.pow(F.element_at(F.col("ys"), (i + 1).cast("int"))
                    - F.element_at(F.col("ys"), i.cast("int")), 2)))
    return (frame.where(F.col("layer") == LAYER_SKELETON)
            .select("url", "part_id", F.size("xs").alias("n_vertices"),
                    F.round(length, 6).alias("line_len"),
                    "n_triangles", "n_pruned", "n_t_junction", "n_x_junction",
                    _geom_chk("xs", "ys").alias("chk"), "error")
            .orderBy("url", "part_id"))


def q_chordal_triangles(spark, sf_dir):
    """The triangulation layer of the dual sink (S3): per-polygon
    triangle counts + a checksum over all triangle coordinates."""
    from .pipeline import pages_to_geoms
    from ..operators.skeleton import LAYER_TRIANGLE, chordal_axis_frame

    pages = _pages_from_documents(spark, sf_dir)
    # chain-break repartition: see q_chordal_axis
    polys = (pages_to_geoms(pages).where(F.col("kind") == 2)
             .repartition(spark.sparkContext.defaultParallelism))
    frame = chordal_axis_frame(polys, correction=True)
    tri = (frame.where(F.col("layer") == LAYER_TRIANGLE)
           .withColumn("row_chk", _geom_chk("part_id", "xs", "ys")))
    return (tri.groupBy("url")
            .agg(F.count("*").alias("n_triangles"),
                 F.xxhash64(F.sort_array(F.collect_list("row_chk"))).alias("chk"))
            .orderBy("url"))


def q_minhash_near_dup(spark, sf_dir):
    from ..operators.dedup import minhash_lsh_pairs
    d = _t(spark, sf_dir, "documents")
    return (minhash_lsh_pairs(d, threshold=0.5, hot_key_cap=1000)
            .orderBy("id_a", "id_b"))


def q_simhash_near_dup(spark, sf_dir):
    """max_hamming=3 — the 4-band scheme's RECALL-GUARANTEED radius
    (an earlier max_hamming=8 pinned a silently incomplete pair set:
    pairs with one differing bit per band share no bucket)."""
    from ..operators.dedup import simhash_pairs
    d = _t(spark, sf_dir, "documents")
    return (simhash_pairs(d, max_hamming=3, hot_key_cap=1000)
            .orderBy("id_a", "id_b"))


def q_simhash_near_dup7(spark, sf_dir):
    """Wider-radius variant: the 8x8-bit band scheme whose pigeonhole
    recall guarantee extends to Hamming<=7 — the radius a real
    dedup pipeline typically wants (round-3 VERDICT #5).  Output is a
    superset of q_simhash_near_dup on the same table."""
    from ..operators.dedup import simhash_pairs
    d = _t(spark, sf_dir, "documents")
    return (simhash_pairs(d, max_hamming=7, hot_key_cap=1000)
            .orderBy("id_a", "id_b"))


def q_simhash_near_dup7_sharded(spark, sf_dir):
    """Sharded radius-7 SimHash — the documented scale mitigation for
    the 8-bit-band Θ(n²/2^w) candidate envelope, first-class in the
    driver battery (VERDICT r4 #3): shard_cols=('lang',) generates
    candidates only WITHIN a language, cutting volume to Θ(Σ n_l²/2^w)
    while keeping the full pigeonhole recall guarantee per shard
    (measured at sf0.1: 6.47M → 1.66M candidates, all planted
    Hamming-4..7 twins recalled; BENCH/simhash_shard_proof_r05.json).
    Output = the per-lang subset of q_simhash_near_dup7's pairs."""
    from ..operators.dedup import simhash_pairs
    d = _t(spark, sf_dir, "documents")
    return (simhash_pairs(d, max_hamming=7, hot_key_cap=1000,
                          shard_cols=("lang",))
            .orderBy("id_a", "id_b"))


def q_embedding_near_dup(spark, sf_dir):
    """Near-duplicate embedding pairs.  Deterministic near-dups are
    PLANTED (every 97th vector gets a scaled twin at -vec_id-1, same
    direction => cos 1.0) so the expected output is provably non-empty
    and the row count is meaningful evidence of LSH recall — a broken
    LSH would miss the planted pairs.  Twin ids are NEGATIVE, which can
    never collide with a real non-negative vec_id at ANY table size
    (the old +10^7 offset collided beyond 10M rows)."""
    from ..operators.similarity import lsh_self_near_dup
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    first = emb.select("embedding").first()
    if first is None or first[0] is None:
        raise ValueError("q_embedding_near_dup: embeddings table is empty")
    dim = len(first[0])
    planted = (emb.where(F.col("vec_id") % 97 == 0)
               .select((-F.col("vec_id") - 1).alias("vec_id"),
                       F.transform("embedding",
                                   lambda v: (v * F.lit(1.001)).cast("float"))
                       .alias("embedding")))
    return (lsh_self_near_dup(emb.unionByName(planted), dim, threshold=0.9,
                              hot_key_cap=1000)
            .orderBy("id_a", "id_b"))


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup over the embeddings table (semdedup.semantic_dedup):
    exact-integer distributed k-means (k=10, 2 Lloyd iterations, seeds
    = 10 smallest ids) + within-cluster quantized-cosine dedup at
    τ=0.95.  The same every-97th planted twins as q_embedding_near_dup
    make the drop set provably non-empty.  Twins whose ORIGINAL is
    itself a seed stay in their own singleton-seeded cluster and
    survive — the documented SemDeDup property that within-cluster
    dedup misses cross-cluster duplicates; the oracle reproduces the
    identical behavior, exact to the integer grid."""
    from ..operators.semdedup import semantic_dedup
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = (emb.where(F.col("vec_id") % 97 == 0)
               .select((-F.col("vec_id") - 1).alias("vec_id"),
                       F.transform("embedding",
                                   lambda v: (v * F.lit(1.001)).cast("float"))
                       .alias("embedding")))
    return (semantic_dedup(emb.unionByName(planted), k=10, iters=2,
                           threshold=0.95)
            .select("vec_id", F.col("cluster").cast("long").alias("cluster"),
                    "keep")
            .orderBy("vec_id"))


SQL_SEMANTIC_DEDUP = """
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT -vec_id - 1,
         list_transform(embedding,
                        x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT))
  FROM embeddings WHERE vec_id % 97 = 0
), q AS (
  SELECT vec_id, i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS v
  FROM base, UNNEST(generate_series(1, len(embedding))) AS u(i)
), seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT vec_id FROM base ORDER BY vec_id LIMIT 10)
), c0 AS (
  SELECT s.cid, q.i, q.v AS c FROM q JOIN seeds s USING (vec_id)
), a0 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY sum((q.v - c.c) * (q.v - c.c)), c.cid) AS rn
    FROM q JOIN c0 c USING (i) GROUP BY q.vec_id, c.cid
  ) WHERE rn = 1
), c1 AS (
  SELECT a.cluster AS cid, q.i,
         (sum(q.v) - ((sum(q.v) % count(*) + count(*)) % count(*)))
           // count(*) AS c
  FROM q JOIN a0 a USING (vec_id) GROUP BY a.cluster, q.i
), a1 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY sum((q.v - c.c) * (q.v - c.c)), c.cid) AS rn
    FROM q JOIN c1 c USING (i) GROUP BY q.vec_id, c.cid
  ) WHERE rn = 1
), c2 AS (
  SELECT a.cluster AS cid, q.i,
         (sum(q.v) - ((sum(q.v) % count(*) + count(*)) % count(*)))
           // count(*) AS c
  FROM q JOIN a1 a USING (vec_id) GROUP BY a.cluster, q.i
), a2 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY sum((q.v - c.c) * (q.v - c.c)), c.cid) AS rn
    FROM q JOIN c2 c USING (i) GROUP BY q.vec_id, c.cid
  ) WHERE rn = 1
), q3 AS (
  SELECT vec_id, i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) AS v
  FROM base, UNNEST(generate_series(1, len(embedding))) AS u(i)
), n2 AS (
  SELECT vec_id, sum(v * v) AS n2 FROM q3 GROUP BY vec_id
), pr AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b, sum(qx.v * qy.v) AS dot
  FROM a2 x JOIN a2 y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  JOIN q3 qx ON qx.vec_id = x.vec_id
  JOIN q3 qy ON qy.vec_id = y.vec_id AND qy.i = qx.i
  GROUP BY x.vec_id, y.vec_id
), dropped AS (
  SELECT DISTINCT p.id_b AS vec_id
  FROM pr p
  JOIN n2 na ON na.vec_id = p.id_a
  JOIN n2 nb ON nb.vec_id = p.id_b
  WHERE p.dot > 0
    AND 10000 * p.dot * p.dot >= 9025 * na.n2 * nb.n2
)
SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS keep
FROM a2 a LEFT JOIN dropped d USING (vec_id)
ORDER BY a.vec_id
"""


def q_ivf_topk(spark, sf_dir):
    """IVF-approximate nearest neighbors (coarse k-means quantizer +
    nprobe list probing + exact in-list re-rank) over the embeddings
    table — the ANN scale path beside brute force (q_embedding_topk)
    and hyperplane LSH (q_embedding_near_dup)."""
    from ..operators.similarity import ivf_topk
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    queries = (emb.where(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")))
    out = ivf_topk(emb, queries, k=5, dim=dim, n_lists=16, nprobe=10)
    return (out.select("qid", "vec_id", (F.col("cos") + F.lit(0.0)).alias("cos"),
                       F.col("rank").cast("long").alias("rank"))
            .orderBy("qid", "rank"))


def q_raster_tiles(spark, sf_dir):
    """Real geometry rasterization per covered cell (X10): boundary
    grid-traversal + even-odd interior fill (holes punched out);
    ``chk`` pins the exact occupancy bitmasks."""
    from .pipeline import pages_to_geoms
    from ..operators.tiling import raster_tile_assign
    pages = _pages_from_documents(spark, sf_dir)
    geoms = pages_to_geoms(pages).where(F.col("kind") == 2)
    out = raster_tile_assign(geoms, res=6)
    return (out.select("cell", "url",
                       F.size(F.filter("occupancy", lambda x: x)).alias("n_occupied"),
                       _geom_chk("occupancy").alias("chk"))
            .orderBy("cell", "url"))


def q_media_features(spark, sf_dir):
    """REAL byte-level media decode: synthesized BMP/WAV blobs parsed
    by the pure-NumPy codecs, 16-dim features, per-row checksum."""
    from ..operators.multimodal import extract_media_features, pages_to_media
    pages = _pages_from_documents(spark, sf_dir)
    out = extract_media_features(pages_to_media(pages))
    rounded = F.transform("feature", lambda v: F.round(v.cast("double"), 6))
    return (out.select("url", "media_type", "n_bytes", "width", "height",
                       F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
                       F.xxhash64(F.to_json(F.struct(rounded.alias("f")))).alias("chk"),
                       "error")
            .orderBy("url"))


def q_text_extract_parity(spark, sf_dir):
    from .pipeline import extracted_text_parity
    pages = _pages_from_documents(spark, sf_dir)
    return (extracted_text_parity(pages)
            .groupBy("ok").agg(F.count("*").alias("n")).orderBy("ok"))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def all_queries():
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q03_order_revenue": q03_order_revenue,
        "q05_nation_volume": q05_nation_volume,
        "q_window_top_orders": q_window_top_orders,
        "q_supplier_rank": q_supplier_rank,
        "q_events_by_type_day": q_events_by_type_day,
        "q_events_sessions": q_events_sessions,
        "q_value_percentiles": q_value_percentiles,
        "q_rollup_revenue": q_rollup_revenue,
        "q_customers_without_orders": q_customers_without_orders,
        "q_hypertable_rollup": q_hypertable_rollup,
        "q_lang_dist": q_lang_dist,
        "q_ngram_topk": q_ngram_topk,
        "q_tfidf_keywords": q_tfidf_keywords,
        "q_lm_perplexity": q_lm_perplexity,
        "q_dup_spans": q_dup_spans,
        "q_pagerank": q_pagerank,
        "q_doc_split": q_doc_split,
        "q_domain_mix": q_domain_mix,
        "q_url_normalize": q_url_normalize,
        "q_domain_cap": q_domain_cap,
        "q_domain_psl": q_domain_psl,
        "q_gopher": q_gopher,
        "q_c4_filters": q_c4_filters,
        "q_bpe_merges": q_bpe_merges,
        "q_bpe_tokenize": q_bpe_tokenize,
        "q_boilerplate": q_boilerplate,
        "q_pii": q_pii,
        "q_curation_web": q_curation_web,
        "q_curation_fuzzy": q_curation_fuzzy,
        "q_curation": q_curation,
        "q_contamination": q_contamination,
        "q_fuzzy_contamination": q_fuzzy_contamination,
        "q_repetition": q_repetition,
        "q_dedup_exact": q_dedup_exact,
        "q_incremental_dedup": q_incremental_dedup,
        "q_fingerprint": q_fingerprint,
        "q_token_stats": q_token_stats,
        "q_pack_manifest": q_pack_manifest,
        "q_pack_chunks": q_pack_chunks,
        "q_temperature_mix": q_temperature_mix,
        "q_dsir_sample": q_dsir_sample,
        "q_bm25_search": q_bm25_search,
        "q_hll_distinct": q_hll_distinct,
        "q_cms_freq": q_cms_freq,
        "q_chunk_docs": q_chunk_docs,
        "q_weighted_sample": q_weighted_sample,
        "q_hist_quantiles": q_hist_quantiles,
        "q_postings": q_postings,
        "q_cell_distinct_pyramid": q_cell_distinct_pyramid,
        "q_phrase_search": q_phrase_search,
        "q_grouping_sets": q_grouping_sets,
        "q_pivot": q_pivot,
        "q_gap_fill": q_gap_fill,
        "q_json_extract": q_json_extract,
        "q_moving_avg": q_moving_avg,
        "q_set_ops": q_set_ops,
        "q_embedding_stats": q_embedding_stats,
        "q_cms_join_size": q_cms_join_size,
        "q_retention": q_retention,
        "q_hll_overlap": q_hll_overlap,
        "q_convex_hull": q_convex_hull,
        "q10_returned_items": q10_returned_items,
        "q_correlated_subquery": q_correlated_subquery,
        "q_text_features": q_text_features,
        "q_cell_encode": q_cell_encode,
        "q_cell_stats": q_cell_stats,
        "q_cell_pyramid": q_cell_pyramid,
        "q_pip_join": q_pip_join,
        "q_range_join": q_range_join,
        "q_poly_join": q_poly_join,
        "q_segment_join": q_segment_join,
        "q_knn": q_knn,
        "q_embedding_topk": q_embedding_topk,
        # rows-only (non-SQL-expressible kernels; every row carries a
        # deterministic chk over the exact output values)
        "q_reduce_bend_tiles": q_reduce_bend_tiles,
        "q_reduce_bend_smooth": q_reduce_bend_smooth,
        "q_dp_simplify": q_dp_simplify,
        "q_vw_simplify": q_vw_simplify,
        "q_chordal_axis": q_chordal_axis,
        "q_chordal_triangles": q_chordal_triangles,
        "q_minhash_near_dup": q_minhash_near_dup,
        "q_simhash_near_dup": q_simhash_near_dup,
        "q_simhash_near_dup7": q_simhash_near_dup7,
        "q_simhash_near_dup7_sharded": q_simhash_near_dup7_sharded,
        "q_winnow_near_dup": q_winnow_near_dup,
        "q_embedding_near_dup": q_embedding_near_dup,
        "q_semantic_dedup": q_semantic_dedup,
        "q_ivf_topk": q_ivf_topk,
        "q_raster_tiles": q_raster_tiles,
        "q_media_features": q_media_features,
        "q_text_extract_parity": q_text_extract_parity,
        "q_asof_events": q_asof_events,
        "q_dedup_clusters": q_dedup_clusters,
        "q_connected_components": q_connected_components,
        "q_minhash_cross_dedup": q_minhash_cross_dedup,
    }


# ---------------------------------------------------------------------------
# URL canonicalization + per-domain cap (operators/urls.py) — the
# crawl-curation stage between ingest and dedup/mixing.  Messy input
# URLs are synthesized deterministically from (doc_id, source) — the
# testdata carries no URL column — identically in Spark and DuckDB.
# ---------------------------------------------------------------------------

def q_url_normalize(spark, sf_dir):
    """Normalize synthesized messy URLs (fragment/tracking-param strip,
    scheme+authority lowercase, default-port strip, bare-root slash
    collapse) and extract host + registrable domain — all scan-stage
    codegen'd scalars, zero UDF, zero shuffle before the tiny ordered
    output."""
    from ..operators.urls import normalize_urls, synth_messy_urls
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return (normalize_urls(synth_messy_urls(d))
            .select("doc_id", "url", "url_norm", "host", "domain")
            .orderBy("doc_id"))


def q_domain_cap(spark, sf_dir):
    """Cap each registrable domain's contribution at 5 docs,
    content-addressed (smallest (md5(text), doc_id) survive).  The
    implementation windows ONLY the over-cap domains (broadcast
    semi-join); under-cap rows pass through sort-free — the oracle is
    the equivalent global row_number formulation."""
    from ..operators.urls import domain_cap, normalize_urls, synth_messy_urls
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    u = normalize_urls(synth_messy_urls(d)).select("doc_id", "text", "domain")
    return (domain_cap(u, cap=5).select("doc_id", "domain")
            .orderBy("doc_id"))


def q_curation_fuzzy(spark, sf_dir):
    """curate_corpus with MinHash near-dup dedup in front (the
    production-shape composition): per-doc survivor rows so the golden
    pins the exact kept set AND its split assignment."""
    from ..operators.curation import curate_corpus_fuzzy
    d = _t(spark, sf_dir, "documents")
    return (curate_corpus_fuzzy(d)
            .select("doc_id", "lang", "n_tokens", "split")
            .orderBy("doc_id"))


def q_gopher(spark, sf_dir):
    """Full Gopher quality-rule battery (Rae et al. 2021 A1) per doc —
    integer-cross-multiplied thresholds (no float anywhere), pure JVM
    projection, zero shuffle before the ordered output."""
    from ..operators.text import with_gopher_rules
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (with_gopher_rules(d)
            .select("doc_id", "n_words", "n_lines", "g1", "g2", "g3",
                    "g4", "g5", "g6", "g7", "gopher_pass")
            .orderBy("doc_id"))


def _sql_gopher() -> str:
    from ..operators.text import GOPHER_STOPWORDS
    stop_terms = " + ".join(
        f"(CASE WHEN regexp_matches(lower(t), '(^|[ \\t\\n\\x0b\\f\\r]){w}([ \\t\\n\\x0b\\f\\r]|\\z)') "
        f"THEN 1 ELSE 0 END)" for w in GOPHER_STOPWORDS)
    return f"""
WITH s AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
w AS (
  SELECT doc_id, t,
         [x for x in regexp_split_to_array(t, '[ \\t\\n\\x0b\\f\\r]+') if x <> ''] AS words,
         string_split(t, chr(10)) AS lines
  FROM s
), c AS (
  SELECT doc_id,
    len(words) AS n_words,
    coalesce(list_sum([length(x) for x in words]), 0) AS word_chars,
    len([x for x in words if regexp_matches(x, '[A-Za-z]')]) AS n_alpha,
    len(regexp_extract_all(t, '#|\\.\\.\\.')) AS n_sym,
    len(lines) AS n_lines,
    len([x for x in lines if regexp_matches(x, '^[ \\t\\n\\x0b\\f\\r]*[•\\-\\*]')]) AS n_bullet,
    len([x for x in lines if regexp_matches(x, '(\\.\\.\\.|…)[ \\t\\n\\x0b\\f\\r]*\\z')]) AS n_ellip,
    ({stop_terms}) AS n_stop
  FROM w
)
SELECT doc_id, n_words, n_lines,
  (n_words >= 50 AND n_words <= 100000) AS g1,
  (word_chars >= 3 * n_words AND word_chars <= 10 * n_words
   AND n_words > 0) AS g2,
  (10 * n_sym <= n_words) AS g3,
  (10 * n_bullet <= 9 * n_lines) AS g4,
  (10 * n_ellip <= 3 * n_lines) AS g5,
  (10 * n_alpha >= 8 * n_words) AS g6,
  (n_stop >= 2) AS g7,
  ((n_words >= 50 AND n_words <= 100000)
   AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words
        AND n_words > 0)
   AND (10 * n_sym <= n_words) AND (10 * n_bullet <= 9 * n_lines)
   AND (10 * n_ellip <= 3 * n_lines) AND (10 * n_alpha >= 8 * n_words)
   AND (n_stop >= 2)) AS gopher_pass
FROM c ORDER BY doc_id
"""


def q_domain_psl(spark, sf_dir):
    """Exact eTLD+1 by longest-suffix match against a (demo) public-
    suffix table — distinct hosts explode candidate suffixes, broadcast
    equi-join the PSL, longest match wins, mapping joins back on host.
    The oracle mirrors the match with a DuckDB list comprehension."""
    from ..operators.urls import (PSL_DEMO, normalize_urls,
                                  registrable_domain_exact,
                                  synth_messy_urls)
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    u = normalize_urls(synth_messy_urls(d))
    psl = spark.createDataFrame([(s,) for s in PSL_DEMO], ["suffix"])
    return (registrable_domain_exact(u, psl)
            .select("doc_id", "host", "domain_exact").orderBy("doc_id"))


def _sql_domain_psl() -> str:
    from ..operators.urls import PSL_DEMO
    values = ", ".join(f"('{s}')" for s in PSL_DEMO)
    return _SQL_URL_CTE + f"""
, psl(suffix) AS (VALUES {values})
, hl AS (
  SELECT host, string_split(host, '.') AS l,
         len(string_split(host, '.')) AS n
  FROM (SELECT DISTINCT host FROM dom)
), cand AS (
  SELECT host,
         unnest([{{'i': i, 's': array_to_string(l[i:n], '.')}}
                 for i in range(1, n + 1)]) AS c
  FROM hl
), win AS (
  SELECT host, min(c.i) AS win_i
  FROM cand JOIN psl ON c.s = psl.suffix
  GROUP BY host
), mapd AS (
  SELECT d.host,
         CASE WHEN w.win_i IS NULL THEN d.domain
              WHEN w.win_i = 1 THEN NULL
              ELSE array_to_string(
                     string_split(d.host, '.')
                       [w.win_i - 1 : len(string_split(d.host, '.'))], '.')
         END AS domain_exact
  FROM (SELECT DISTINCT host, domain FROM dom) d
  LEFT JOIN win w ON d.host = w.host
)
SELECT dom.doc_id, dom.host, mapd.domain_exact
FROM dom JOIN mapd ON dom.host = mapd.host
ORDER BY dom.doc_id
"""


_SQL_URL_CTE = """
WITH s AS (
  SELECT doc_id, text, source, md5('u' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), m AS (
  SELECT doc_id, text,
    (CASE WHEN substring(h,1,1) < '8' THEN 'https' ELSE 'HTTPS' END)
    || '://'
    || (CASE WHEN substring(h,2,1) < '4' THEN upper(source) ELSE source END)
    || (CASE WHEN substring(h,3,1) < '8' THEN '.com'
             WHEN substring(h,3,1) < 'c' THEN '.co.uk' ELSE '.org' END)
    || (CASE WHEN substring(h,4,1) < '3' THEN ':443'
             WHEN substring(h,4,1) < '6' THEN ':8080' ELSE '' END)
    || (CASE WHEN substring(h,5,1) < '2' THEN '/'
             WHEN substring(h,5,1) < '4' THEN ''
             ELSE '/Doc/' || CAST(doc_id AS VARCHAR) END)
    || (CASE WHEN substring(h,6,1) < '4'
               THEN '?utm_source=x&ref=' || CAST(doc_id AS VARCHAR)
             WHEN substring(h,6,1) < '8'
               THEN '?ref=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=y'
             WHEN substring(h,6,1) < 'c' THEN '?utm_only=1' ELSE '' END)
    || (CASE WHEN substring(h,1,1) >= 'c' THEN '#sec' ELSE '' END) AS url
  FROM s
), n2a AS (
  SELECT doc_id, text, url,
         regexp_extract(regexp_replace(url, '#[\\s\\S]*', '', 'g'),
                        '^([^?]*)', 1) AS base,
         regexp_extract(regexp_replace(url, '#[\\s\\S]*', '', 'g'),
                        '^[^?]*\\?([\\s\\S]*)', 1) AS query
  FROM m
), n2 AS (
  SELECT doc_id, text, url,
    CASE WHEN length(query) = 0 THEN base
         WHEN len([p for p in string_split(query, '&')
                   if NOT regexp_matches(p, '^(utm_[^=&#]*|fbclid|gclid)=')])
              = 0 THEN base
         ELSE base || '?' || array_to_string(
                [p for p in string_split(query, '&')
                 if NOT regexp_matches(p, '^(utm_[^=&#]*|fbclid|gclid)=')],
                '&')
    END AS x2
  FROM n2a
), n3 AS (
  SELECT *, lower(regexp_extract(x2, '^([^/?#]*://[^/?#]*)', 1))
            || regexp_replace(x2, '^[^/?#]*://[^/?#]*', '', 'g') AS x3
  FROM n2
), n5 AS (
  SELECT *, regexp_replace(
    regexp_replace(
      regexp_replace(x3, '^(http://[^/?#:]*):80(\\z|[/?#][\\s\\S]*)', '\\1\\2', 'g'),
      '^(https://[^/?#:]*):443(\\z|[/?#][\\s\\S]*)', '\\1\\2', 'g'),
    '^(https?://[^/?#]*)/\\z', '\\1', 'g') AS url_norm
  FROM n3
), hx AS (
  SELECT *, regexp_extract(url_norm, '^[a-z]+://([^/:?#]*)', 1) AS host
  FROM n5
), dom AS (
  SELECT doc_id, text, url, url_norm, host,
    CASE WHEN len(string_split(host, '.')) <= 2 THEN host
         WHEN (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1])
              IN ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
                  'org.au','co.jp','or.jp','ne.jp','com.br','com.cn',
                  'com.mx','co.in','co.kr','com.tr','com.ar','co.za',
                  'com.sg','com.hk')
           THEN string_split(host, '.')[-3] || '.'
                || string_split(host, '.')[-2] || '.'
                || string_split(host, '.')[-1]
         ELSE string_split(host, '.')[-2] || '.'
              || string_split(host, '.')[-1] END AS domain
  FROM hx
)"""

SQL_URL_NORMALIZE = _SQL_URL_CTE + """
SELECT doc_id, url, url_norm, host, domain FROM dom ORDER BY doc_id
"""

SQL_DOMAIN_CAP = _SQL_URL_CTE + """
, ranked AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain
                            ORDER BY md5(coalesce(text, '')), doc_id) AS rn
  FROM dom
)
SELECT doc_id, domain FROM ranked WHERE rn <= 5 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Line-level boilerplate removal (operators/boilerplate.py) — CCNet-style
# document-frequency line stripping over a deterministically synthesized
# multi-line page (the testdata docs are single-line; same synth-in-both-
# engines pattern as the URL queries above).
# ---------------------------------------------------------------------------

def q_boilerplate(spark, sf_dir):
    """Strip lines appearing in >= 5 distinct docs (header / per-source
    nav / footer all vanish; genuine 12-token content lines survive).
    One line-key hash-agg shuffle, broadcast anti-join removal, one
    doc-granularity rebuild shuffle — no UDF anywhere."""
    from ..operators.boilerplate import (remove_boilerplate,
                                         synth_pages_with_boilerplate)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    pages = synth_pages_with_boilerplate(d)
    return (remove_boilerplate(pages, min_docs=5)
            .select("doc_id", "n_lines", "n_dropped", "text_clean")
            .orderBy("doc_id"))


def _sql_wrap_lines(text_expr: str, tpl: int, suffix_sql: str = "''") -> str:
    """DuckDB twin of text.wrap_token_lines — ONE definition serving
    both the boilerplate and C4 page-synth oracles."""
    return (
        f"list_transform(\n"
        f"         range(greatest("
        f"(len(string_split({text_expr}, ' ')) + {tpl - 1}) // {tpl}, 1)),\n"
        f"         i -> array_to_string(\n"
        f"                (string_split({text_expr}, ' '))"
        f"[i*{tpl}+1 : i*{tpl}+{tpl}], ' ') || {suffix_sql})")


def _sql_boiler_chain(src_cte: str, text_col: str) -> str:
    """Shared CTE chain ``pg .. cleaned``: page synthesis (header /
    per-source nav / 12-token wrap / footer) over ``src_cte.text_col``
    followed by document-frequency line stripping (>= 5 docs).  Used
    verbatim by BOTH SQL_BOILERPLATE and the composed curation twin, so
    a synth or threshold change cannot silently diverge between them
    (it mirrors boilerplate.synth_pages_with_boilerplate +
    remove_boilerplate rule-for-rule)."""
    from ..operators.boilerplate import TOKENS_PER_LINE as _BTPL
    return f"""pg AS (
  SELECT doc_id,
    ['home | about | contact', 'section: ' || source]
    || {_sql_wrap_lines(text_col, _BTPL)}
    || ['(c) example corp - all rights reserved'] AS lines
  FROM {src_cte}
), bl AS (
  SELECT doc_id, generate_subscripts(lines, 1) AS pos, unnest(lines) AS line
  FROM pg
), bk AS (
  SELECT doc_id, pos, line, lower(trim(line)) AS key FROM bl
), bc AS (
  SELECT key, count(DISTINCT doc_id) AS n_docs FROM bk GROUP BY key
), bkept AS (
  SELECT bk.doc_id, bk.pos, bk.line FROM bk JOIN bc ON bk.key = bc.key
  WHERE bc.n_docs < 5
), bagg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text_clean
  FROM bkept GROUP BY doc_id
), cleaned AS (
  SELECT pg.doc_id, len(pg.lines) AS n_lines,
         len(pg.lines) - coalesce(bagg.n_kept, 0) AS n_dropped,
         coalesce(bagg.text_clean, '') AS text_clean
  FROM pg LEFT JOIN bagg ON pg.doc_id = bagg.doc_id
)"""


SQL_BOILERPLATE = ("WITH " + _sql_boiler_chain("documents", "text") + """
SELECT doc_id, n_lines, n_dropped, text_clean FROM cleaned
ORDER BY doc_id
""")


# ---------------------------------------------------------------------------
# C4 heuristic cleaning battery (operators/c4.py) — Raffel et al. 2020
# line + page rules over a deterministic multi-line page synth.
# ---------------------------------------------------------------------------

def q_c4_filters(spark, sf_dir):
    """C4 line rules (terminal punct / >=5 words / no 'javascript') +
    page rules (>=3 surviving sentences, no lorem ipsum / brace /
    bad-list word) — pure scan-stage higher-order-function columns,
    zero UDF, zero shuffle before the ordered output."""
    from ..operators.c4 import synth_c4_pages, with_c4_rules
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = with_c4_rules(synth_c4_pages(d))
    return (out.select("doc_id", "n_lines", "n_kept", "n_sentences",
                       "has_lorem", "has_brace", "has_badword",
                       "c4_pass", "text_c4")
            .orderBy("doc_id"))


def _sql_c4() -> str:
    from ..operators.c4 import (BAD_LINE, BRACE_LINE, C4_BAD_WORDS,
                                FOOTER_LINE, JS_LINE, LOREM_LINE,
                                MIN_LINE_WORDS, MIN_SENTENCES, NAV_LINE,
                                TOKENS_PER_LINE)
    ws = "[ \\t\\n\\x0b\\f\\r]"
    tpl = TOKENS_PER_LINE
    bad = " OR ".join(
        f"regexp_matches(lower(page), '(^|[^a-z0-9]){w}([^a-z0-9]|\\z)')"
        for w in C4_BAD_WORDS)
    # line predicate mirrors c4._line_keep rule-for-rule
    keep = (f"regexp_matches(l, '[.!?\"]{ws}*\\z') "
            f"AND len([x for x in regexp_split_to_array(l, '{ws}+') "
            f"if x <> '']) >= {MIN_LINE_WORDS} "
            f"AND NOT contains(lower(l), 'javascript')")
    return f"""
WITH pg AS (
  SELECT doc_id,
    array_to_string(
      ['{NAV_LINE}']
      || {_sql_wrap_lines("text", tpl,
                          "(CASE WHEN i % 3 <> 2 THEN '.' ELSE '' END)")}
      || (CASE WHEN doc_id % 7 = 0 THEN ['{JS_LINE}']
          ELSE CAST([] AS VARCHAR[]) END)
      || (CASE WHEN doc_id % 11 = 0 THEN ['{LOREM_LINE}']
          ELSE CAST([] AS VARCHAR[]) END)
      || (CASE WHEN doc_id % 13 = 0 THEN ['{BRACE_LINE}']
          ELSE CAST([] AS VARCHAR[]) END)
      || (CASE WHEN doc_id % 17 = 0 THEN ['{BAD_LINE}']
          ELSE CAST([] AS VARCHAR[]) END)
      || ['{FOOTER_LINE}'], chr(10)) AS page
  FROM documents
), r AS (
  SELECT doc_id, page,
    string_split(page, chr(10)) AS lines,
    [l for l in string_split(page, chr(10)) if {keep}] AS kept
  FROM pg
), c AS (
  SELECT doc_id,
    len(lines) AS n_lines, len(kept) AS n_kept,
    len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]'))
      AS n_sentences,
    contains(lower(page), 'lorem ipsum') AS has_lorem,
    contains(page, '{{') AS has_brace,
    ({bad}) AS has_badword,
    array_to_string(kept, chr(10)) AS text_c4
  FROM r
)
SELECT doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
  has_badword,
  (n_sentences >= {MIN_SENTENCES} AND NOT has_lorem AND NOT has_brace
   AND NOT has_badword) AS c4_pass,
  text_c4
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Bloom-filter incremental snapshot dedup (operators/bloom.py): new
# snapshot vs existing corpus.  Bloom has no false negatives, so the
# result is EXACTLY the plain anti-join — which is the DuckDB twin;
# a hash-match proves the whole bitmap machinery.
# ---------------------------------------------------------------------------

def q_incremental_dedup(spark, sf_dir):
    """Synth snapshot: every doc re-crawled with doc_id+1e6; docs with
    doc_id%4==0 carry IDENTICAL text (true dups), the rest gained a
    ' novel' suffix.  Dedup against the old corpus by md5(text) via
    bloom prefilter + exact-confirm anti-join on the positive sliver."""
    from ..operators.bloom import incremental_dedup
    d = _t(spark, sf_dir, "documents")
    old = d.select(F.md5("text").alias("key"))
    new = (d.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.when(F.col("doc_id") % 4 == 0, F.col("text"))
             .otherwise(F.concat(F.col("text"), F.lit(" novel")))
             .alias("text"))
           .select("doc_id", F.md5("text").alias("key")))
    return (incremental_dedup(new, old, key_col="key")
            .select("doc_id", "key").orderBy("doc_id"))


SQL_INCREMENTAL_DEDUP = """
WITH old AS (SELECT md5(text) AS key FROM documents),
n AS (
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text
              ELSE text || ' novel' END AS text
  FROM documents
), nk AS (SELECT doc_id, md5(text) AS key FROM n)
SELECT nk.doc_id, nk.key FROM nk
ANTI JOIN old ON nk.key = old.key
ORDER BY nk.doc_id
"""


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer (operators/bpe.py) — train on the corpus
# word-frequency table, tokenize via the distinct-word mapping join.
# Training is argmax-iterative (not SQL-expressible): pinned golden
# oracles; pytest cross-validates vs an independent pure-Python trainer.
# ---------------------------------------------------------------------------

BPE_DRIVER_MERGES = 30
# memo over (sf_dir, n_merges): training is a deterministic pure
# function of the input table, and both BPE queries need the same
# merge list — re-deriving it would double the sequential-round cost.
_BPE_MEMO: dict = {}


def _bpe_merges_for(spark, sf_dir):
    key = (sf_dir, BPE_DRIVER_MERGES)
    if key not in _BPE_MEMO:
        from ..operators.bpe import train_bpe, word_freqs
        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        _BPE_MEMO[key] = train_bpe(word_freqs(d),
                                   n_merges=BPE_DRIVER_MERGES)
    return _BPE_MEMO[key]


def q_bpe_merges(spark, sf_dir):
    """The learned merge list itself (rank, left, right, merged,
    pair_count): one corpus word-count shuffle, then per round one
    pair-count hash-agg over the DISTINCT-WORD table + a TakeOrdered-1
    argmax (deterministic count-desc/pair-asc tie-break)."""
    m = _bpe_merges_for(spark, sf_dir)
    # explicit schema: an empty merge list (degenerate corpus) must
    # yield an empty TYPED frame, not a schema-inference error
    return (spark.createDataFrame(
                m, schema="rank long, left string, right string, "
                          "merged string, pair_count long")
            .select(F.col("rank").cast("long"), "left", "right", "merged",
                    F.col("pair_count").cast("long"))
            .orderBy("rank"))


def q_bpe_tokenize(spark, sf_dir):
    """Tokenize every document with the merges learned on the same
    corpus: scan-stage pre-token split + join against the per-distinct-
    word subword mapping (vocabulary-bounded Arrow UDF — the corpus
    never passes through Python).  chk pins the exact token sequence."""
    from ..operators.bpe import apply_bpe
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = apply_bpe(d, _bpe_merges_for(spark, sf_dir))
    return (out.select(
                "doc_id", "n_bpe",
                F.array_join(F.slice("bpe_tokens", 1, 5), " ").alias("head"),
                F.xxhash64(F.array_join("bpe_tokens", "\x01")).alias("chk"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# PII detection + redaction (operators/pii.py) — emails / IPv4 / phones
# planted deterministically (plus a 3-octet near-miss negative), counted
# and redacted with cross-engine-identical regexes.
# ---------------------------------------------------------------------------

def q_pii(spark, sf_dir):
    """PII counts over the original text + typed-placeholder redaction —
    pure scan-stage regex columns, zero shuffle before the ordered
    output."""
    from ..operators.pii import redact_pii, synth_pii_text, with_pii
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    p = synth_pii_text(d)
    out = redact_pii(with_pii(p, text_col="pii_text"), text_col="pii_text")
    return (out.select("doc_id", "n_emails", "n_ipv4", "n_phones",
                       "has_pii", "text_redacted")
            .orderBy("doc_id"))


# Shared PII-synthesis CTE pair (mirrors pii.synth_pii_text
# digit-for-digit); used by BOTH the q_pii twin and the composed
# curation twin — one definition, no copy to drift.
_SQL_PII_SYNTH_CTE = """ps AS (
  SELECT doc_id, text, source, md5('p' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), pm AS (
  SELECT doc_id, source,
    text
    || (CASE WHEN substring(h,1,1) < '8'
          THEN ' contact ' || source || '.' || substring(h,9,2)
               || '@mail-' || source
               || (CASE WHEN substring(h,2,1) < '8'
                   THEN '.com' ELSE '.org' END)
          ELSE '' END)
    || (CASE WHEN substring(h,3,1) < '6'
          THEN ' server 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
               || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
               || CAST((doc_id * 13) % 256 AS VARCHAR)
          ELSE '' END)
    || (CASE WHEN substring(h,4,1) < '4'
          THEN ' call +1 555-'
               || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')
         WHEN substring(h,4,1) < '8'
          THEN ' tel (555) '
               || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST((doc_id * 9) % 10000 AS VARCHAR), 4, '0')
          ELSE '' END)
    || (CASE WHEN substring(h,5,1) < '4' THEN ' v10.2.33 build'
        ELSE '' END) AS pii_text
  FROM ps
)"""


def _sql_redact(col: str) -> str:
    """Typed-placeholder redaction expression (email -> IP -> phone, the
    fixed order redact_pii applies); @..@ placeholders are substituted
    with the shared pii.py patterns by the final builder."""
    return ("regexp_replace(regexp_replace(regexp_replace(" + col + ",\n"
            "        '@EMAIL@', '<EMAIL>', 'g'), '@IPV4@', '<IP>', 'g'),\n"
            "        '@PHONE@', '<PHONE>', 'g')")


def _subst_pii_patterns(sql: str) -> str:
    from ..operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE
    return (sql.replace("@EMAIL@", EMAIL_RE)
               .replace("@IPV4@", IPV4_RE)
               .replace("@PHONE@", PHONE_RE))


def _sql_pii() -> str:
    sql = "WITH " + _SQL_PII_SYNTH_CTE + """
, f AS (
  SELECT doc_id, pii_text,
    len(regexp_extract_all(pii_text, '@EMAIL@')) AS n_emails,
    len(regexp_extract_all(pii_text, '@IPV4@')) AS n_ipv4,
    len(regexp_extract_all(pii_text, '@PHONE@')) AS n_phones,
    """ + _sql_redact("pii_text") + """ AS text_redacted
  FROM pm
)
SELECT doc_id, n_emails, n_ipv4, n_phones,
       (n_emails + n_ipv4 + n_phones) > 0 AS has_pii, text_redacted
FROM f ORDER BY doc_id
"""
    return _subst_pii_patterns(sql)


# ---------------------------------------------------------------------------
# Composed web-curation pipeline (operators/curation.curate_web_corpus):
# URL domain -> boilerplate strip -> PII redact -> exact dedup ->
# quality -> domain cap -> split, the ENTIRE composition hash-verified
# as one oracle.  The SQL twin chains the already-verified per-stage
# twins (URL CTE, page synth, boilerplate CTEs, redaction regexes,
# dedup row_number, repetition stats, cap window, split bucket).
# ---------------------------------------------------------------------------

def q_curation_web(spark, sf_dir):
    """curate_web_corpus over documents — one row per surviving doc
    with its domain, boilerplate-drop counters, token stats and split."""
    from ..operators.curation import curate_web_corpus
    d = _t(spark, sf_dir, "documents")
    return curate_web_corpus(d).orderBy("doc_id")


def _sql_curation_web() -> str:
    sql = (_SQL_URL_CTE + ", " + _SQL_PII_SYNTH_CTE + ", "
           + _sql_boiler_chain("pm", "pii_text") + """
, red AS (
  SELECT c.doc_id, c.n_lines, c.n_dropped, dom.domain,
         """ + _sql_redact("c.text_clean") + """ AS text_redacted
  FROM cleaned c JOIN dom ON c.doc_id = dom.doc_id
), reps AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY
                   md5(text_redacted) ORDER BY doc_id) AS rn
                 FROM red) WHERE rn = 1
), tok2 AS (
  SELECT doc_id, domain, n_lines, n_dropped, text_redacted,
         replace(text_redacted, chr(10), ' ') AS stats_text,
         len(string_split(replace(text_redacted, chr(10), ' '), ' '))
           AS n_tokens
  FROM reps
), """ + _sql_rep_stats("tok2", "stats_text") + """,
kept2 AS (
  SELECT t.*, r.top_share FROM tok2 t JOIN rep_stats r USING (doc_id)
  WHERE n_tokens >= 20 AND top_share <= 0.12
), capped AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY domain
                   ORDER BY md5(text_redacted), doc_id) AS crn
                 FROM kept2) WHERE crn <= 10
)
SELECT doc_id, domain, n_lines, n_dropped, n_tokens, top_share,
       """ + _sql_split_case("text_redacted") + """ AS split
FROM capped ORDER BY doc_id
""")
    return _subst_pii_patterns(sql)


# ---------------------------------------------------------------------------
# Pinned golden-file oracles for the non-SQL-expressible kernels.
#
# The geometry / LSH / decode queries below have no ANSI-SQL twin (the
# greedy bend order, CDT, banded LSH joins and BMP/PCM decoding ARE the
# spec), so their oracle is the pinned expected output itself: a
# parquet file under tests/data/expected/<sf>/ generated once by
# tools/make_golden_oracles.py from kernels that are themselves gated
# by the 43 reference-golden pytest cases (exact vertex sequences) and
# the property suites, then determinism-checked at two parallelism
# levels (local[8] vs local[32], bit-identical multisets).  Provenance
# and regeneration protocol: FIXTURES.md "Golden oracles".
#
# DuckDB reads the file via read_parquet(); the driver's
# rows+schema+hash compare then acts as a real regression gate for the
# geometry layer instead of the weaker rows-only check.  The driver
# correctness gate runs at sf0.01; local verification at other SFs
# selects the matching pinned set via SPARK_GRAFT_GOLDEN_SF
# (tools/verify_oracles.py sets it from the sf_dir basename).
# ---------------------------------------------------------------------------

GOLDEN_ORACLE_QUERIES = [
    "q_reduce_bend_tiles",
    "q_reduce_bend_smooth",
    "q_dp_simplify",
    "q_vw_simplify",
    "q_chordal_axis",
    "q_chordal_triangles",
    "q_minhash_near_dup",
    "q_simhash_near_dup",
    "q_simhash_near_dup7",
    "q_simhash_near_dup7_sharded",
    "q_curation_fuzzy",
    "q_winnow_near_dup",
    "q_embedding_near_dup",
    "q_ivf_topk",
    "q_raster_tiles",
    "q_media_features",
    "q_text_extract_parity",
    "q_dedup_clusters",
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_minhash_cross_dedup",
]


def _golden_sql(name: str) -> str:
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    sf_name = _os.environ.get("SPARK_GRAFT_GOLDEN_SF", "sf0.01")
    path = _os.path.join(repo, "tests", "data", "expected", sf_name,
                         f"{name}.parquet")
    return f"SELECT * FROM read_parquet('{path}')"


def all_oracles():
    return {
        "q01_pricing_summary": SQL_Q01,
        "q03_order_revenue": SQL_Q03,
        "q05_nation_volume": SQL_Q05,
        "q_window_top_orders": SQL_WINDOW_TOP,
        "q_supplier_rank": SQL_SUPPLIER_RANK,
        "q_events_by_type_day": SQL_EVENTS_DAY,
        "q_events_sessions": SQL_EVENTS_SESSIONS,
        "q_value_percentiles": SQL_VALUE_PERCENTILES,
        "q_rollup_revenue": SQL_ROLLUP_REVENUE,
        "q_customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
        "q_hypertable_rollup": SQL_HYPERTABLE_ROLLUP,
        "q_lang_dist": SQL_LANG_DIST,
        "q_ngram_topk": SQL_NGRAM_TOPK,
        "q_tfidf_keywords": SQL_TFIDF_KEYWORDS,
        "q_lm_perplexity": SQL_LM_PERPLEXITY,
        "q_dup_spans": SQL_DUP_SPANS,
        "q_pagerank": _sql_pagerank(),
        "q_doc_split": SQL_DOC_SPLIT,
        "q_domain_mix": SQL_DOMAIN_MIX,
        "q_url_normalize": SQL_URL_NORMALIZE,
        "q_domain_cap": SQL_DOMAIN_CAP,
        "q_domain_psl": _sql_domain_psl(),
        "q_gopher": _sql_gopher(),
        "q_c4_filters": _sql_c4(),
        "q_boilerplate": SQL_BOILERPLATE,
        "q_pii": _sql_pii(),
        "q_curation_web": _sql_curation_web(),
        "q_curation": SQL_CURATION,
        "q_contamination": SQL_CONTAMINATION,
        "q_fuzzy_contamination": SQL_FUZZY_CONTAMINATION,
        "q_repetition": SQL_REPETITION,
        "q_dedup_exact": SQL_DEDUP_EXACT,
        "q_incremental_dedup": SQL_INCREMENTAL_DEDUP,
        "q_fingerprint": SQL_FINGERPRINT,
        "q_token_stats": SQL_TOKEN_STATS,
        "q_pack_manifest": SQL_PACK_MANIFEST,
        "q_pack_chunks": SQL_PACK_CHUNKS,
        "q_temperature_mix": SQL_TEMPERATURE_MIX,
        "q_dsir_sample": SQL_DSIR_SAMPLE,
        "q_bm25_search": SQL_BM25_SEARCH,
        "q_hll_distinct": _sql_hll_distinct(),
        "q_cms_freq": _sql_cms_freq(),
        "q_chunk_docs": _sql_chunk_docs(),
        "q_weighted_sample": SQL_WEIGHTED_SAMPLE,
        "q_hist_quantiles": _sql_hist_quantiles(),
        "q_postings": SQL_POSTINGS,
        "q_cell_distinct_pyramid": _sql_cell_distinct_pyramid(),
        "q_phrase_search": SQL_PHRASE_SEARCH,
        "q_grouping_sets": SQL_GROUPING_SETS,
        "q_pivot": SQL_PIVOT,
        "q_gap_fill": SQL_GAP_FILL,
        "q_json_extract": SQL_JSON_EXTRACT,
        "q_moving_avg": SQL_MOVING_AVG,
        "q_set_ops": SQL_SET_OPS,
        "q_embedding_stats": SQL_EMBEDDING_STATS,
        "q_cms_join_size": _sql_cms_join_size(),
        "q_retention": SQL_RETENTION,
        "q_hll_overlap": _sql_hll_overlap(),
        "q_convex_hull": SQL_CONVEX_HULL,
        "q10_returned_items": SQL_Q10,
        "q_correlated_subquery": SQL_CORRELATED,
        "q_text_features": _sql_text_features(),
        "q_cell_encode": SQL_CELL_ENCODE,
        "q_cell_stats": SQL_CELL_STATS,
        "q_cell_pyramid": SQL_CELL_PYRAMID,
        "q_pip_join": SQL_PIP_JOIN,
        "q_range_join": SQL_RANGE_JOIN,
        "q_poly_join": SQL_POLY_JOIN,
        "q_segment_join": SQL_SEGMENT_JOIN,
        "q_knn": SQL_KNN,
        "q_embedding_topk": SQL_EMBEDDING_TOPK,
        "q_semantic_dedup": SQL_SEMANTIC_DEDUP,
        "q_asof_events": SQL_ASOF_EVENTS,
        "q_connected_components": SQL_CONNECTED_COMPONENTS,
        # pinned golden-file oracles (see GOLDEN_ORACLE_QUERIES above)
        **{name: _golden_sql(name) for name in GOLDEN_ORACLE_QUERIES},
    }


# ---------------------------------------------------------------------------
# as-of join (temporal alignment; union-sort implementation vs DuckDB
# ASOF JOIN oracle)
# ---------------------------------------------------------------------------

def q_asof_events(spark, sf_dir):
    """For each sampled event, the latest STRICTLY-PRIOR event of the
    same user (union-sort as-of join, operators/asof.py)."""
    from ..operators.asof import as_of_join
    from pyspark.sql.window import Window
    e = _t(spark, sf_dir, "events")
    left = e.where(F.col("event_id") % 10 == 0)
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    right = (e.withColumn("_rn", F.row_number().over(w))
             .where("_rn = 1").drop("_rn"))
    out = as_of_join(left, right, on="user_id", left_time="ts",
                     right_time="ts", value_cols=["event_id", "value"],
                     strict=True)
    return (out.select("event_id", "user_id",
                       F.col("asof_event_id"),
                       F.col("asof_value"))
            .orderBy("event_id"))


SQL_ASOF_EVENTS = """
WITH l AS (SELECT * FROM events WHERE event_id % 10 = 0),
r AS (SELECT * FROM (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1)
SELECT l.event_id, l.user_id,
       r.event_id AS asof_event_id, r.value AS asof_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts > r.ts
ORDER BY l.event_id
"""


# ---------------------------------------------------------------------------
# connected components / near-dup clustering (operators/graph.py)
# ---------------------------------------------------------------------------

def q_connected_components(spark, sf_dir):
    """Iterative min-label propagation (hash-min) over a deterministic
    modular graph on doc ids: path chains (runs of 13 consecutive ids —
    forces >= 12 propagation rounds) merged by sparse hub links.
    Oracle: DuckDB recursive-CTE transitive closure + min-root."""
    from ..operators.graph import connected_components
    d = _t(spark, sf_dir, "documents").select("doc_id")
    chains = (d.where((F.pmod(F.col("doc_id"), F.lit(13)) != 0)
                      & (F.col("doc_id") >= 1))
              .select(F.col("doc_id").alias("id_a"),
                      (F.col("doc_id") - 1).alias("id_b")))
    hubs = (d.where(F.pmod(F.col("doc_id"), F.lit(11)) == 0)
            .select(F.col("doc_id").alias("id_a"),
                    F.pmod(F.col("doc_id"), F.lit(97)).alias("id_b")))
    edges = chains.unionByName(hubs)
    return (connected_components(edges)
            .select(F.col("id").cast("long").alias("id"),
                    F.col("component").cast("long").alias("component"))
            .orderBy("id"))


SQL_CONNECTED_COMPONENTS = """
WITH RECURSIVE raw_edges AS (
  SELECT doc_id AS a, doc_id - 1 AS b FROM documents
  WHERE doc_id % 13 <> 0 AND doc_id >= 1
  UNION ALL
  SELECT doc_id, doc_id % 97 FROM documents WHERE doc_id % 11 = 0
), edges AS (
  SELECT a AS src, b AS dst FROM raw_edges WHERE a <> b
  UNION
  SELECT b, a FROM raw_edges WHERE a <> b
), r(id, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id
)
SELECT id, min(root) AS component FROM r GROUP BY id ORDER BY id
"""


def q_dedup_clusters(spark, sf_dir):
    """The full near-dup pipeline ending: exact dedup FIRST (so
    mega-duplicate sets can never trip the hot-key guard), MinHash-LSH
    pairs over representatives, connected components, canonical
    (min-id survivor) flag.  Pairs are non-SQL-expressible, so this is
    rows-only with a per-row chk; the components operator itself is
    hash-verified by q_connected_components."""
    from ..operators.dedup import near_dup_clusters
    d = _t(spark, sf_dir, "documents")
    out = near_dup_clusters(d, threshold=0.5)
    return (out.select("doc_id", "cluster_id", "is_canonical",
                       _geom_chk("doc_id", "cluster_id", "is_canonical")
                       .alias("chk"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# concat-and-chunk sequence packing (operators/packing.py) — the
# training-batch layout stage after curation.  The Spark side computes
# the global token prefix sum with the two-pass distributed pattern
# (range repartition + per-partition offsets broadcast back); the
# oracle is the plain global-window formulation — the semantic spec the
# distributed version must (and does) hash-match.
# ---------------------------------------------------------------------------

PACK_SEQ_LEN = 2048

_SQL_PACK_BASE = r"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+'))
              AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
  FROM tok
), m AS (
  SELECT doc_id, n_tokens, tok_start,
         tok_start // {L} AS chunk_first,
         (tok_start + n_tokens - 1) // {L} AS chunk_last,
         tok_start % {L} AS chunk_offset
  FROM c
)
"""


def q_pack_manifest(spark, sf_dir):
    """Per-document packing manifest: where each doc's tokens land when
    the corpus is concatenated in doc_id order and cut into
    PACK_SEQ_LEN-token training sequences.  Exercises the distributed
    prefix sum (packing._prefix_sum) against the oracle's global
    window."""
    from ..operators.packing import pack_manifest
    from ..operators.text import token_count
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    return pack_manifest(t, PACK_SEQ_LEN).orderBy("doc_id")


SQL_PACK_MANIFEST = _SQL_PACK_BASE.format(L=PACK_SEQ_LEN) + """
SELECT doc_id, n_tokens, tok_start, chunk_first, chunk_last,
       chunk_offset, chunk_last - chunk_first + 1 AS n_chunks
FROM m ORDER BY doc_id
"""


def q_pack_chunks(spark, sf_dir):
    """Per-chunk composition of the packed layout (how many documents
    feed each training sequence): explode each manifest row into its
    overlapped chunks, one hash-agg on the int chunk id.  Every chunk
    but the last must own exactly PACK_SEQ_LEN tokens — the oracle
    hash-checks that invariant value-by-value."""
    from ..operators.packing import chunk_stats, pack_manifest
    from ..operators.text import token_count
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    return chunk_stats(pack_manifest(t, PACK_SEQ_LEN),
                       PACK_SEQ_LEN).orderBy("chunk_id")


SQL_PACK_CHUNKS = _SQL_PACK_BASE.format(L=PACK_SEQ_LEN) + """
SELECT chunk_id, count(*) AS n_docs,
       CAST(sum(least((chunk_id + 1) * {L}, tok_start + n_tokens)
                - greatest(chunk_id * {L}, tok_start)) AS BIGINT)
         AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM (SELECT m.doc_id, m.tok_start, m.n_tokens, u.chunk_id
      FROM m, UNNEST(generate_series(m.chunk_first, m.chunk_last))
             AS u(chunk_id))
GROUP BY chunk_id ORDER BY chunk_id
""".replace("{L}", str(PACK_SEQ_LEN))


# ---------------------------------------------------------------------------
# temperature-based language resampling (operators/sampling.py) — the
# multilingual mixture stage (mBERT/XLM-R/UniMax α-sampling).
# ---------------------------------------------------------------------------

def q_temperature_mix(spark, sf_dir):
    """α=0.5 temperature resampling of the documents table toward a
    target of half the corpus: low-resource languages are boosted
    (kept whole once a_l ≥ 1), the head language is downsampled —
    membership content-addressed, acceptance tested with the integer
    cross-multiplication in DECIMAL(38,0).  target = N//2 is a bounded
    driver scalar (same idiom as the tfidf N); the oracle computes it
    as a scalar subquery."""
    from ..operators.sampling import temperature_sample
    d = _t(spark, sf_dir, "documents")
    target = d.count() // 2
    return (temperature_sample(d, target, alpha=0.5,
                               group_col="lang", content_col="text")
            .select("doc_id", "lang")
            .orderBy("doc_id"))


SQL_TEMPERATURE_MIX = """
WITH st AS (
  SELECT lang, count(*) AS n_l FROM documents GROUP BY lang
), st2 AS (
  SELECT lang, n_l, CAST(floor(sqrt(n_l) * 1000) AS BIGINT) AS s_l FROM st
), tot AS (
  SELECT CAST(sum(s_l) AS BIGINT) AS s_tot FROM st2
), tgt AS (
  SELECT count(*) // 2 AS t FROM documents
)
SELECT d.doc_id, d.lang
FROM documents d JOIN st2 USING (lang), tot, tgt
WHERE CAST(('0x' || substr(md5(d.text), 1, 3))::UBIGINT AS HUGEINT)
        * tot.s_tot * st2.n_l
      < CAST(tgt.t AS HUGEINT) * st2.s_l * 4096
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/dsir.py) — target-domain data
# selection over hashed unigram features.
# ---------------------------------------------------------------------------

def q_dsir_sample(spark, sf_dir):
    """DSIR selection with source='src0' documents as the target
    domain: hashed-unigram (md5-bucket, B=1024) log importance weights,
    integer-quantized per bucket before the per-doc sum (lm.py
    discipline), top-200 by (w7 desc, doc_id) via TakeOrdered."""
    from ..operators.dsir import dsir_top_k
    d = _t(spark, sf_dir, "documents")
    return (dsir_top_k(d, F.col("source") == "src0", k=200)
            .select("doc_id", "n_tokens", "w7"))


SQL_DSIR_SAMPLE = r"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')) AS term
  FROM documents
), tk AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(term), 1, 4))::UBIGINT % 1024 AS b
  FROM toks WHERE term != ''
), cnt AS (
  SELECT b,
         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS ct,
         CAST(sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS BIGINT)
           AS cr
  FROM tk GROUP BY b
), tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
  FROM cnt
), lam AS (
  SELECT b,
         CAST(round((ln((ct + 1.0) / (nt + 1024.0))
                     - ln((cr + 1.0) / (nr + 1024.0))) * 1e7)
              AS BIGINT) AS l7
  FROM cnt, tot
)
SELECT doc_id, count(*) AS n_tokens, CAST(sum(l7) AS BIGINT) AS w7
FROM tk JOIN lam USING (b)
GROUP BY doc_id
ORDER BY w7 DESC, doc_id LIMIT 200
"""


# ---------------------------------------------------------------------------
# BM25 full-text search (operators/search.py)
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ["customer", "hash", "spark", "window"]


def q_bm25_search(spark, sf_dir):
    """Top-20 documents by BM25 for a fixed bag-of-terms query —
    scan-stage term filter, |query|-row broadcast df table, one
    doc-keyed hash-agg, TakeOrdered; per-term scores integer-quantized
    (1e-7) before the per-doc sum so both engines sum exactly."""
    from ..operators.search import bm25_search
    d = _t(spark, sf_dir, "documents")
    return bm25_search(d, BM25_QUERY_TERMS, k=20)


SQL_BM25_SEARCH = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '[ \t\n\x0b\f\r]+')) AS term
  FROM documents
), tk AS (
  SELECT * FROM toks WHERE term != ''
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tk GROUP BY doc_id
), sc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tt
  FROM dl
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tk WHERE term IN ('customer', 'hash', 'spark', 'window')
  GROUP BY doc_id, term
), dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), s AS (
  SELECT tf.doc_id,
         CAST(round((ln(1.0 + (sc.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                     * (tf.tf * (1.2 + 1.0)))
                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                         / (CAST(sc.tt AS DOUBLE) / sc.n_docs)))
                    * 1e7) AS BIGINT) AS s7
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), sc
)
SELECT doc_id, count(*) AS n_match_terms, CAST(sum(s7) AS BIGINT) AS score7
FROM s GROUP BY doc_id ORDER BY score7 DESC, doc_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# Mergeable sketches (operators/sketches.py) — HyperLogLog distinct
# count and Count-Min frequency.  The DuckDB twins rebuild the EXACT
# same sketch (md5-prefix hash, integer register arithmetic, shared
# float literals), so even the estimates hash-match; the exact truth
# rides along in the same output row as the self-documenting error
# bound.
# ---------------------------------------------------------------------------

CMS_PROBE_TERMS = ["customer", "hash", "spark", "window", "zzz_absent"]


def q_hll_distinct(spark, sf_dir):
    """Per-returnflag distinct-partkey HLL estimate (p=9, 512
    registers) next to the exact count: scan -> ONE register hash-agg
    (max has map-side partials, at most 512 rows per group survive the
    shuffle regardless of group size) -> per-group fold.  The sketch
    table is the persisted artifact at 100 TB: tomorrow's partition
    merges in with union+max, never a rescan."""
    from ..operators.sketches import hll_estimate, hll_sketch
    li = _t(spark, sf_dir, "lineitem")
    keys = li.select("l_returnflag",
                     F.col("l_partkey").cast("string").alias("k"))
    est = hll_estimate(hll_sketch(keys, "k", ["l_returnflag"]),
                       ["l_returnflag"])
    exact = (keys.groupBy("l_returnflag")
             .agg(F.countDistinct("k").alias("exact")))
    return (est.join(exact, "l_returnflag")
            .select("l_returnflag", "n_regs", "ind_sum", "est", "exact")
            .orderBy("l_returnflag"))


def _sql_hll_distinct() -> str:
    from ..operators.sketches import hll_estimate_sql, hll_sketch_sql
    src = "(SELECT l_returnflag, CAST(l_partkey AS VARCHAR) AS k FROM lineitem)"
    return f"""
WITH regs AS ({hll_sketch_sql(src, 'k', ['l_returnflag'])}
), folded AS ({hll_estimate_sql('regs', ['l_returnflag'])}
), ex AS (
  SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_regs, ind_sum, est, exact
FROM folded JOIN ex USING (l_returnflag) ORDER BY l_returnflag
"""


def q_cms_freq(spark, sf_dir):
    """Count-Min frequency estimates (depth 4 x width 1024) for a
    fixed probe-term set over the document token stream, next to the
    exact counts: scan (the 4 hash rows explode inline) -> ONE counter
    hash-agg bounded at depth*width rows, probe rows broadcast.  The
    CMS guarantee est >= exact is visible in the output; the absent
    probe reports 0."""
    import pandas as pd

    from ..operators.sketches import cms_estimate, cms_sketch
    from ..operators.text import WS_CLASS
    d = _t(spark, sf_dir, "documents")
    toks = (d.select(F.explode(
                F.split(F.trim(F.col("text")), WS_CLASS + "+")).alias("term"))
            .where(F.col("term") != ""))
    sk = cms_sketch(toks, "term")
    probes = spark.createDataFrame(pd.DataFrame({"term": CMS_PROBE_TERMS}))
    est = cms_estimate(sk, probes, "term")
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    return (est.join(exact, "term", "left")
            .select("term", "est",
                    F.coalesce("exact", F.lit(0).cast("long")).alias("exact"))
            .orderBy("term"))


def _sql_cms_freq() -> str:
    from ..operators.sketches import cms_bucket_sql
    depth, width = 4, 1024
    probe_list = ", ".join(f"'{t}'" for t in CMS_PROBE_TERMS)
    counters = " UNION ALL ".join(
        f"SELECT {j} AS row, {cms_bucket_sql('term', j, width)} AS bucket, "
        f"1::BIGINT AS w FROM tk" for j in range(depth))
    probe_rows = " UNION ALL ".join(
        f"SELECT term, {j} AS row, {cms_bucket_sql('term', j, width)} "
        f"AS bucket FROM probes" for j in range(depth))
    return f"""
WITH tk AS (
  SELECT term FROM (
    SELECT unnest(string_split_regex(trim(text),
                  '[ \\t\\n\\x0b\\f\\r]+')) AS term FROM documents)
  WHERE term != ''
), sk AS (
  SELECT row, bucket, CAST(sum(w) AS BIGINT) AS cnt
  FROM ({counters}) GROUP BY row, bucket
), probes AS (
  SELECT unnest([{probe_list}]) AS term
), pb AS ({probe_rows}
), hit AS (
  SELECT pb.term, min(sk.cnt) AS min_cnt, count(*) AS n_rows
  FROM sk JOIN pb USING (row, bucket) GROUP BY pb.term
), est AS (
  SELECT probes.term,
         CAST(coalesce(CASE WHEN hit.n_rows < {depth} THEN 0
                            ELSE hit.min_cnt END, 0) AS BIGINT) AS est
  FROM probes LEFT JOIN hit USING (term)
), ex AS (
  SELECT term, CAST(count(*) AS BIGINT) AS exact FROM tk GROUP BY term
)
SELECT est.term, est.est, CAST(coalesce(ex.exact, 0) AS BIGINT) AS exact
FROM est LEFT JOIN ex USING (term) ORDER BY term
"""


# ---------------------------------------------------------------------------
# Sliding-window document chunking (text.chunk_documents) — RAG /
# context-window prep.
# ---------------------------------------------------------------------------

CHUNK_TOKENS, CHUNK_OVERLAP = 32, 8


def q_chunk_docs(spark, sf_dir):
    """Every document re-cut into 32-token chunks overlapping by 8:
    the chunk array builds and posexplodes inside the scan stage —
    zero shuffle, zero UDF (the orderBy is presentation-only; the
    driver hashes order-insensitively)."""
    from ..operators.text import chunk_documents
    d = _t(spark, sf_dir, "documents")
    return (chunk_documents(d, CHUNK_TOKENS, CHUNK_OVERLAP)
            .orderBy("doc_id", "chunk_id"))


def _sql_chunk_docs() -> str:
    c, o = CHUNK_TOKENS, CHUNK_OVERLAP
    s = c - o
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+'),
                     t -> t != '') AS toks
  FROM documents
), n AS (
  SELECT doc_id, toks,
         greatest((len(toks) - {o} + {s - 1}) // {s}, 1) AS n_chunks
  FROM tk
), ex AS (
  SELECT doc_id, CAST(n_chunks AS INT) AS n_chunks,
         CAST(unnest(range(n_chunks)) AS INT) AS chunk_id, toks
  FROM n
)
SELECT doc_id, chunk_id, n_chunks,
       array_to_string(toks[chunk_id*{s}+1 : chunk_id*{s}+{c}], ' ')
         AS chunk_text,
       CAST(CASE WHEN array_to_string(
                        toks[chunk_id*{s}+1 : chunk_id*{s}+{c}], ' ') = ''
                 THEN 0
                 ELSE len(string_split(array_to_string(
                        toks[chunk_id*{s}+1 : chunk_id*{s}+{c}], ' '), ' '))
            END AS BIGINT) AS chunk_n_tokens
FROM ex ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# Deterministic weighted sampling without replacement
# (sampling.weighted_sample, Efraimidis & Spirakis 2006)
# ---------------------------------------------------------------------------

def q_weighted_sample(spark, sf_dir):
    """Top-10 documents per lang under length-proportional weights
    (w = n_chars): content-addressed uniforms, integer-quantized rank
    keys, ONE per-stratum window — membership is a pure function of
    the content, stable under any repartitioning."""
    from ..operators.sampling import weighted_sample
    d = _t(spark, sf_dir, "documents")
    return (weighted_sample(d.select("doc_id", "lang", "n_chars", "text"),
                            "n_chars", 10, strata_cols=["lang"])
            .select("doc_id", "lang", "n_chars", "ws_key7", "ws_rank")
            .orderBy("lang", "ws_rank"))


SQL_WEIGHTED_SAMPLE = r"""
WITH w AS (
  SELECT doc_id, lang, n_chars,
         CAST(round(ln(CAST(CAST(('0x' || substr(md5(text), 1, 13))::UBIGINT
                               AS BIGINT) + 1 AS DOUBLE)
                       / CAST(4503599627370496.0 AS DOUBLE))
                    / CAST(n_chars AS DOUBLE) * 1e7) AS BIGINT) AS ws_key7
  FROM documents
  WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0.0
), r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY ws_key7 DESC, doc_id) AS INT) AS ws_rank
  FROM w
)
SELECT doc_id, lang, n_chars, ws_key7, ws_rank
FROM r WHERE ws_rank <= 10 ORDER BY lang, ws_rank
"""


# ---------------------------------------------------------------------------
# Polygon-polygon intersects join (spark_joins.diamond_join) — exact
# integer separating-axis refine over diamond geometries; the whole
# join (cover, candidates, dedup, refine) is JVM Column arithmetic,
# so the DuckDB twin is the brute-force cross join with the SAME four
# integer SAT inequalities.
# ---------------------------------------------------------------------------

_DIAMONDS_NATION = """
  SELECT CAST(n_nationkey AS BIGINT) AS a_id,
         CAST(n_nationkey * 2311 % 18000 - 9000 AS BIGINT) AS acx,
         CAST(n_nationkey * 1523 % 18000 - 9000 AS BIGINT) AS acy,
         CAST(500 + (n_nationkey % 7) * 300 AS BIGINT) AS aw,
         CAST(500 + (n_nationkey % 5) * 300 AS BIGINT) AS ah
  FROM nation
"""

_DIAMONDS_SUPPLIER = """
  SELECT CAST(s_suppkey AS BIGINT) AS b_id,
         CAST(s_suppkey * 3571 % 18000 - 9000 AS BIGINT) AS bcx,
         CAST(s_suppkey * 2861 % 18000 - 9000 AS BIGINT) AS bcy,
         CAST(300 + (s_suppkey % 11) * 240 AS BIGINT) AS bw,
         CAST(300 + (s_suppkey % 13) * 180 AS BIGINT) AS bh
  FROM supplier
"""


def _diamonds_from_nation(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(k.cast("long").alias("a_id"),
                    (k * 2311 % 18000 - 9000).cast("long").alias("acx"),
                    (k * 1523 % 18000 - 9000).cast("long").alias("acy"),
                    (F.lit(500) + (k % 7) * 300).cast("long").alias("aw"),
                    (F.lit(500) + (k % 5) * 300).cast("long").alias("ah"))


def _diamonds_from_supplier(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return s.select(k.cast("long").alias("b_id"),
                    (k * 3571 % 18000 - 9000).cast("long").alias("bcx"),
                    (k * 2861 % 18000 - 9000).cast("long").alias("bcy"),
                    (F.lit(300) + (k % 11) * 240).cast("long").alias("bw"),
                    (F.lit(300) + (k % 13) * 180).cast("long").alias("bh"))


def _joined_extent(spark, frames, scale: float = 1000.0):
    """Union bbox of several (df, minx_col, miny_col, maxx_col,
    maxy_col) geometry frames in DEGREES — a 4-scalar driver agg (the
    adjudicated bounded-scalar idiom, cf. derive_epsilon) that feeds
    pick_res so the join grid follows the data extent instead of a
    hardcoded resolution."""
    parts = [df.select(mnx.alias("mnx"), mny.alias("mny"),
                       mxx.alias("mxx"), mxy.alias("mxy"))
             for df, mnx, mny, mxx, mxy in frames]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    row = u.agg(F.min("mnx"), F.min("mny"), F.max("mxx"), F.max("mxy"),
                F.avg(F.greatest(F.col("mxx") - F.col("mnx"),
                                 F.col("mxy") - F.col("mny")))).collect()[0]
    out = tuple(float(v) / scale for v in row[:4])
    return out + (float(row[4]) / scale,)  # (.., mean per-feature span)


def q_poly_join(spark, sf_dir):
    """Diamond-diamond intersects join — grid cell-cover candidates,
    reference-point dedup, exact integer SAT refine; every stage is
    JVM Column arithmetic (no Python worker in the plan, gated in
    tests).  Resolution is extent-adaptive (pick_res): identical output
    at any res, but the cell equi-join keeps O(100+) distinct keys."""
    from ..operators.spark_joins import diamond_join, pick_res_for_spans
    a = _diamonds_from_nation(spark, sf_dir)
    b = _diamonds_from_supplier(spark, sf_dir)
    *ext, span = _joined_extent(spark, [
        (a, F.col("acx") - F.col("aw"), F.col("acy") - F.col("ah"),
         F.col("acx") + F.col("aw"), F.col("acy") + F.col("ah")),
        (b, F.col("bcx") - F.col("bw"), F.col("bcy") - F.col("bh"),
         F.col("bcx") + F.col("bw"), F.col("bcy") + F.col("bh"))])
    return (diamond_join(a, b, res=pick_res_for_spans(*ext, span))
            .orderBy("a_id", "b_id"))


def _sql_sat_hit() -> str:
    """The four separating-axis inequalities, integer-exact — the
    literal twin of spark_joins.diamond_sat_intersects."""
    conds = []
    for ux, uy in [("ah", "aw"), ("ah", "-aw"),
                   ("bh", "bw"), ("bh", "-bw")]:
        proj = f"abs((bcx - acx) * ({ux}) + (bcy - acy) * ({uy}))"
        ra = f"greatest(abs(aw * ({ux})), abs(ah * ({uy})))"
        rb = f"greatest(abs(bw * ({ux})), abs(bh * ({uy})))"
        conds.append(f"{proj} <= {ra} + {rb}")
    return "\n  AND ".join(conds)


SQL_POLY_JOIN = f"""
WITH a AS ({_DIAMONDS_NATION}), b AS ({_DIAMONDS_SUPPLIER})
SELECT a_id, b_id
FROM a, b
WHERE {_sql_sat_hit()}
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch (sketches.hist_sketch /
# hist_quantiles) — the artifact-persistable, engine-portable
# counterpart of approx_percentile.
# ---------------------------------------------------------------------------

HIST_LO, HIST_HI, HIST_BINS = 900.0, 105000.0, 1024
HIST_QS = [0.25, 0.5, 0.9, 0.99]


def q_hist_quantiles(spark, sf_dir):
    """Per-returnflag price quantiles from a 1024-bin histogram
    sketch: the data shuffles ONCE into a <=bins-rows-per-group
    register table (map-side sum partials); the quantile fold windows
    over the sketch, never the data.  est7 is the integer-quantized
    interpolated estimate — error bound one bin width by
    construction."""
    from ..operators.sketches import hist_quantiles, hist_sketch
    li = _t(spark, sf_dir, "lineitem")
    sk = hist_sketch(li, "l_extendedprice", ["l_returnflag"],
                     HIST_LO, HIST_HI, HIST_BINS)
    return (hist_quantiles(sk, HIST_QS, ["l_returnflag"],
                           HIST_LO, HIST_HI, HIST_BINS)
            .orderBy("l_returnflag", "q7"))


def _sql_hist_quantiles() -> str:
    from ..operators.sketches import hist_quantiles_sql, hist_sketch_sql
    return ("WITH regs AS ("
            + hist_sketch_sql("lineitem", "l_extendedprice",
                              ["l_returnflag"], HIST_LO, HIST_HI, HIST_BINS)
            + ")"
            + hist_quantiles_sql("regs", HIST_QS, ["l_returnflag"],
                                 HIST_LO, HIST_HI, HIST_BINS)
            + " ORDER BY l_returnflag, q7")


# ---------------------------------------------------------------------------
# Inverted-index postings artifact (search.build_postings)
# ---------------------------------------------------------------------------

def q_postings(spark, sf_dir):
    """Postings table over the document token stream, df-pruned at
    [2, 400]: two hash-aggs total, per-term arrays assembled with a
    deterministic doc_id sort so the row is engine-rebuildable
    byte-for-byte."""
    from ..operators.search import build_postings
    d = _t(spark, sf_dir, "documents")
    return (build_postings(d, min_df=2, max_df=400)
            .orderBy("term"))


SQL_POSTINGS = r"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(terms, 1) - 1 AS pos,
         unnest(terms) AS term
  FROM (SELECT doc_id,
               string_split_regex(trim(text), '[ \t\n\x0b\f\r]+') AS terms
        FROM documents)
), tk AS (
  SELECT * FROM toks WHERE term != ''
), per_doc AS (
  SELECT term, doc_id,
         list_sort(list(pos)) AS positions,
         CAST(count(*) AS BIGINT) AS tf
  FROM tk GROUP BY term, doc_id
), rows_ AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS total_tf,
         list(doc_id ORDER BY doc_id) AS doc_ids,
         list(tf ORDER BY doc_id) AS tfs,
         flatten(list(positions ORDER BY doc_id)) AS positions
  FROM per_doc GROUP BY term
)
SELECT term, df, total_tf, doc_ids, tfs, positions
FROM rows_ WHERE df >= 2 AND df <= 400 ORDER BY term
"""


# ---------------------------------------------------------------------------
# Segment-segment intersection join (spark_joins.segment_join) —
# exact integer CCW predicates (CLRS 33.1), zero Python in the plan.
# ---------------------------------------------------------------------------

_SEGMENTS_CUSTOMER = """
  SELECT CAST(c_custkey AS BIGINT) AS a_id,
         CAST(c_custkey * 7919 % 18000 - 9000 AS BIGINT) AS ax1,
         CAST(c_custkey * 104729 % 18000 - 9000 AS BIGINT) AS ay1,
         CAST(c_custkey * 7919 % 18000 - 9000
              + (c_custkey * 31 % 2001) - 1000 AS BIGINT) AS ax2,
         CAST(c_custkey * 104729 % 18000 - 9000
              + (c_custkey * 37 % 2001) - 1000 AS BIGINT) AS ay2
  FROM customer
"""

_SEGMENTS_SUPPLIER = """
  SELECT CAST(s_suppkey AS BIGINT) AS b_id,
         CAST(s_suppkey * 3571 % 18000 - 9000 AS BIGINT) AS bx1,
         CAST(s_suppkey * 2861 % 18000 - 9000 AS BIGINT) AS by1,
         CAST(s_suppkey * 3571 % 18000 - 9000
              + (s_suppkey * 53 % 2401) - 1200 AS BIGINT) AS bx2,
         CAST(s_suppkey * 2861 % 18000 - 9000
              + (s_suppkey * 59 % 2401) - 1200 AS BIGINT) AS by2
  FROM supplier
"""


def _segments_from_customer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    x1 = (k * 7919 % 18000 - 9000).cast("long")
    y1 = (k * 104729 % 18000 - 9000).cast("long")
    return c.select(k.cast("long").alias("a_id"), x1.alias("ax1"),
                    y1.alias("ay1"),
                    (x1 + (k * 31 % 2001) - 1000).cast("long").alias("ax2"),
                    (y1 + (k * 37 % 2001) - 1000).cast("long").alias("ay2"))


def _segments_from_supplier(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    x1 = (k * 3571 % 18000 - 9000).cast("long")
    y1 = (k * 2861 % 18000 - 9000).cast("long")
    return s.select(k.cast("long").alias("b_id"), x1.alias("bx1"),
                    y1.alias("by1"),
                    (x1 + (k * 53 % 2401) - 1200).cast("long").alias("bx2"),
                    (y1 + (k * 59 % 2401) - 1200).cast("long").alias("by2"))


def q_segment_join(spark, sf_dir):
    """Which customer segments cross which supplier segments — grid
    cell-cover candidates, reference-point dedup, exact integer CCW
    refine; no Python stage anywhere in the plan.  Resolution is
    extent-adaptive (pick_res — the round-5 scale-killer fix: res 6
    over this +-9 degree extent left ~30 occupied cells, so per-cell
    candidates grew quadratically and the refine ran near-serial)."""
    from ..operators.spark_joins import pick_res_for_spans, segment_join
    a = _segments_from_customer(spark, sf_dir)
    b = _segments_from_supplier(spark, sf_dir)
    *ext, span = _joined_extent(spark, [
        (a, F.least("ax1", "ax2"), F.least("ay1", "ay2"),
         F.greatest("ax1", "ax2"), F.greatest("ay1", "ay2")),
        (b, F.least("bx1", "bx2"), F.least("by1", "by2"),
         F.greatest("bx1", "bx2"), F.greatest("by1", "by2"))])
    return (segment_join(a, b, res=pick_res_for_spans(*ext, span))
            .orderBy("a_id", "b_id"))


def _sql_seg_hit() -> str:
    def cross3(ox, oy, ax, ay, bx, by):
        return (f"(({ax}) - ({ox})) * (({by}) - ({oy})) "
                f"- (({ay}) - ({oy})) * (({bx}) - ({ox}))")

    d1 = cross3("bx1", "by1", "bx2", "by2", "ax1", "ay1")
    d2 = cross3("bx1", "by1", "bx2", "by2", "ax2", "ay2")
    d3 = cross3("ax1", "ay1", "ax2", "ay2", "bx1", "by1")
    d4 = cross3("ax1", "ay1", "ax2", "ay2", "bx2", "by2")

    def on_seg(px, py, qx, qy, rx, ry):
        return (f"(least({px}, {qx}) <= {rx} AND {rx} <= greatest({px}, {qx})"
                f" AND least({py}, {qy}) <= {ry}"
                f" AND {ry} <= greatest({py}, {qy}))")

    proper = (f"((({d1}) > 0 AND ({d2}) < 0) OR (({d1}) < 0 AND ({d2}) > 0))"
              f" AND ((({d3}) > 0 AND ({d4}) < 0)"
              f" OR (({d3}) < 0 AND ({d4}) > 0))")
    touch = (f"(({d1}) = 0 AND {on_seg('bx1','by1','bx2','by2','ax1','ay1')})"
             f" OR (({d2}) = 0 AND {on_seg('bx1','by1','bx2','by2','ax2','ay2')})"
             f" OR (({d3}) = 0 AND {on_seg('ax1','ay1','ax2','ay2','bx1','by1')})"
             f" OR (({d4}) = 0 AND {on_seg('ax1','ay1','ax2','ay2','bx2','by2')})")
    return f"(({proper}) OR ({touch}))"


SQL_SEGMENT_JOIN = f"""
WITH a AS ({_SEGMENTS_CUSTOMER}), b AS ({_SEGMENTS_SUPPLIER})
SELECT a_id, b_id
FROM a, b
WHERE {_sql_seg_hit()}
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Hierarchical HLL pyramid (sketches.cell_hll_pyramid): distinct keys
# per tile at every zoom — registers roll up by max, data scans once.
# ---------------------------------------------------------------------------

def q_cell_distinct_pyramid(spark, sf_dir):
    """Distinct-key estimate per cell at res 12 plus two coarser
    levels; keys are pid % 500 (forced collisions so distinct <
    count).  Raw rows shuffle ONCE into level-0 registers; levels 1-2
    are register max-merges bounded at m rows/cell."""
    from ..operators.sketches import cell_hll_pyramid
    from ..operators.spark_joins import cell_encode_col
    pts = _points_from_customer(spark, sf_dir)
    keyed = pts.select(
        cell_encode_col(F.col("lon"), F.col("lat"), CELL_RES).alias("cell"),
        (F.col("pid") % 500).cast("string").alias("k"))
    return (cell_hll_pyramid(keyed, "k", levels=2)
            .orderBy("level", "cell"))


def _sql_cell_distinct_pyramid() -> str:
    from ..operators.sketches import hll_estimate_sql, hll_sketch_sql
    parent = _SQL_PARENT
    est = {i: hll_estimate_sql(f"regs{i}", ["cell"]) for i in range(3)}
    return f"""
WITH cells AS ({_sql_morton_cell(CELL_RES)}),
keyed AS (
  SELECT cell, CAST(pid % 500 AS VARCHAR) AS k FROM cells
),
regs0 AS ({hll_sketch_sql('keyed', 'k', ['cell'])}),
regs1 AS (
  SELECT {parent} AS cell, reg, CAST(max(rho) AS INT) AS rho
  FROM regs0 GROUP BY 1, reg
),
regs2 AS (
  SELECT {parent} AS cell, reg, CAST(max(rho) AS INT) AS rho
  FROM regs1 GROUP BY 1, reg
)
SELECT cell, 0 AS level, n_regs, ind_sum, est FROM ({est[0]})
UNION ALL
SELECT cell, 1 AS level, n_regs, ind_sum, est FROM ({est[1]})
UNION ALL
SELECT cell, 2 AS level, n_regs, ind_sum, est FROM ({est[2]})
ORDER BY level, cell
"""


# ---------------------------------------------------------------------------
# Exact phrase search (search.phrase_search)
# ---------------------------------------------------------------------------

PHRASE_TERMS = ["table", "part"]


def q_phrase_search(spark, sf_dir):
    """Documents containing the exact phrase 'table part' with
    occurrence counts — scan-stage term filter, one (doc, position)
    equi-join per extra phrase token, one hash-agg."""
    from ..operators.search import phrase_search
    d = _t(spark, sf_dir, "documents")
    return phrase_search(d, PHRASE_TERMS).orderBy("doc_id")


SQL_PHRASE_SEARCH = r"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(terms, 1) - 1 AS pos,
         unnest(terms) AS term
  FROM (SELECT doc_id,
               string_split_regex(trim(text), '[ \t\n\x0b\f\r]+') AS terms
        FROM documents)
), t0 AS (
  SELECT doc_id, pos AS p0 FROM toks WHERE term = 'table'
), t1 AS (
  SELECT doc_id, pos - 1 AS p0 FROM toks WHERE term = 'part'
)
SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM t0 JOIN t1 USING (doc_id, p0)
GROUP BY t0.doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Relational surface: GROUPING SETS and PIVOT
# ---------------------------------------------------------------------------

def q_grouping_sets(spark, sf_dir):
    """Revenue over GROUPING SETS ((flag,status),(flag),(status),()) —
    the generalized rollup; DECIMAL(28,8)-exact sums, NULL group keys
    folded to sentinels so the hash compare is order-insensitive."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql("""
        SELECT coalesce(l_returnflag, '*') AS flag,
               coalesce(l_linestatus, '*') AS status,
               -- sum stays DECIMAL-exact; emitted as double via
               -- double(unscaled)/double(1e8) — bit-mimics how the
               -- twin's DECIMAL(28,8) lands as float64 in the driver's
               -- canon frame (duckdb converts int128/10^scale with two
               -- roundings; a correctly-rounded CAST(dec AS DOUBLE)
               -- diverges by 1 ulp once the unscaled value > 2^53)
               CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))
                        * CAST(1.0 - l_discount AS DECIMAL(28,8)))
                    AS DECIMAL(30,8)) * 100000000 AS DECIMAL(38,0))
                    AS DOUBLE) / CAST(100000000 AS DOUBLE) AS revenue,
               count(*) AS n
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        ORDER BY flag, status
    """)


SQL_GROUPING_SETS = """
SELECT coalesce(l_returnflag, '*') AS flag,
       coalesce(l_linestatus, '*') AS status,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))
                * CAST(1.0 - l_discount AS DECIMAL(28,8)))
            AS DECIMAL(28,8)) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
ORDER BY flag, status
"""


def _dec_to_duck_double(col):
    """DECIMAL(p,8) -> double exactly as duckdb's .df() converts it:
    double(unscaled int128) / double(10^8) — two IEEE roundings.  A
    correctly-rounded CAST(dec AS DOUBLE) diverges by 1 ulp once the
    unscaled value exceeds 2^53 (the big revenue sums)."""
    return ((col.cast("decimal(30,8)") * F.lit(100000000))
            .cast("decimal(38,0)").cast("double")
            / F.lit(100000000).cast("double"))


def q_pivot(spark, sf_dir):
    """Revenue pivoted to one column per linestatus — Spark's pivot
    relational operator with an explicit value list (no
    distinct-discovery job); the oracle writes the equivalent
    conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(28,8)")
           * (F.lit(1.0) - F.col("l_discount")).cast("decimal(28,8)"))
    return (li.select("l_returnflag", "l_linestatus", rev.alias("rev"))
            .groupBy("l_returnflag")
            .pivot("l_linestatus", ["F", "O"])
            .agg(F.coalesce(F.sum("rev"),
                            F.lit(0).cast("decimal(28,8)")))
            .select(F.col("l_returnflag"),
                    # DECIMAL-exact sums; emitted as double via
                    # double(unscaled)/double(1e8), bit-mimicking the
                    # twin's duckdb DECIMAL->float64 landing (see
                    # q_grouping_sets)
                    _dec_to_duck_double(
                        F.col("F").cast("decimal(28,8)")).alias("rev_f"),
                    _dec_to_duck_double(
                        F.col("O").cast("decimal(28,8)")).alias("rev_o"))
            .orderBy("l_returnflag"))


SQL_PIVOT = """
SELECT l_returnflag,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_extendedprice AS DECIMAL(28,8))
                     * CAST(1.0 - l_discount AS DECIMAL(28,8)) END), 0)
            AS DECIMAL(28,8)) AS rev_f,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_extendedprice AS DECIMAL(28,8))
                     * CAST(1.0 - l_discount AS DECIMAL(28,8)) END), 0)
            AS DECIMAL(28,8)) AS rev_o
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Cross-corpus fuzzy dedup (dedup.minhash_lsh_join) — new-crawl vs
# reference-corpus near-duplicate join; pinned golden oracle (banded
# LSH is not ANSI-SQL-expressible; FIXTURES.md G6 protocol).
# ---------------------------------------------------------------------------

def q_minhash_cross_dedup(spark, sf_dir):
    """Near-dup join of a synthetic 'new crawl' against the documents
    corpus: every 7th document reappears with two appended tokens
    (jaccard ~0.9 — must match), every 7th+3 reappears token-REVERSED
    (shingles disjoint — must not match).  Band buckets of both sides
    hash-join on (band, bh); exact shingle-set Jaccard verifies."""
    from ..operators.dedup import minhash_lsh_join
    d = _t(spark, sf_dir, "documents")
    perturbed = (d.where(F.col("doc_id") % 7 == 0)
                 .select((F.col("doc_id") + 1000000).alias("doc_id"),
                         F.concat(F.col("text"),
                                  F.lit(" extracross token")).alias("text")))
    reversed_ = (d.where(F.col("doc_id") % 7 == 3)
                 .select((F.col("doc_id") + 2000000).alias("doc_id"),
                         F.array_join(F.reverse(F.split(
                             F.trim(F.col("text")), " ")), " ").alias("text")))
    new_crawl = perturbed.unionByName(reversed_)
    return (minhash_lsh_join(d.select("doc_id", "text"), new_crawl,
                             threshold=0.6)
            .orderBy("left_id", "right_id"))


# ---------------------------------------------------------------------------
# Time-series gap fill (timeseries.gap_fill)
# ---------------------------------------------------------------------------

def q_gap_fill(spark, sf_dir):
    """Hourly per-event-type value series densified: the raw events
    hash-agg ONCE into (type, hour) buckets (DECIMAL-exact sums), the
    spine explodes sequence(min, max, 1h) per type, absent hours
    forward-fill from the latest earlier bucket and flag gap=true."""
    from ..operators.timeseries import gap_fill
    ev = _t(spark, sf_dir, "events")
    buckets = (ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("tb"))
        .agg(F.sum(F.col("value").cast("decimal(28,8)"))
             .cast("decimal(28,8)").alias("v"),
             F.count(F.lit(1)).alias("n")))
    # v emitted as double (the twin's DECIMAL lands as float64 in the
    # driver's canon frame); forward-fill and sums stay DECIMAL-exact
    return (gap_fill(buckets, "tb", ["event_type"], ["v", "n"], 3600)
            .withColumn("v", F.col("v").cast("double"))
            .orderBy("event_type", "tb"))


SQL_GAP_FILL = """
WITH buckets AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS tb,
         CAST(sum(CAST(value AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, tb
), spine AS (
  SELECT event_type, CAST(unnest(generate_series(mn, mx, 3600)) AS BIGINT) AS tb
  FROM (SELECT event_type, min(tb) AS mn, max(tb) AS mx
        FROM buckets GROUP BY event_type)
), joined AS (
  SELECT spine.event_type, spine.tb, buckets.v AS v0, buckets.n AS n0,
         buckets.tb IS NULL AS gap
  FROM spine LEFT JOIN buckets USING (event_type, tb)
)
SELECT event_type, tb,
       CAST(last_value(v0 IGNORE NULLS) OVER w AS DECIMAL(28,8)) AS v,
       CAST(last_value(n0 IGNORE NULLS) OVER w AS BIGINT) AS n,
       gap
FROM joined
WINDOW w AS (PARTITION BY event_type ORDER BY tb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_type, tb
"""


# ---------------------------------------------------------------------------
# Semi-structured JSON column surface: schema-on-read extraction from
# the events props column (from_json with an explicit schema — never
# schema inference, which would scan twice), then a plain aggregate.
# ---------------------------------------------------------------------------

def q_json_extract(spark, sf_dir):
    """Parse events.props ('{"k": 69}') with an explicit schema inside
    the scan stage and aggregate k per event type — the
    semi-structured-column pattern at scale: no inference pass, no
    UDF, malformed rows yield NULL k and are counted, not dropped."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("k").alias("n_parsed"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"))
            .orderBy("event_type"))


SQL_JSON_EXTRACT = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_parsed,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# RANGE-frame moving aggregate + set-operation surface
# ---------------------------------------------------------------------------

def q_moving_avg(spark, sf_dir):
    """Per-event-type trailing-1-hour moving sum/count over the event
    stream — a RANGE BETWEEN frame keyed on the integer epoch second
    (value-based, not row-based: simultaneous events share a frame).
    DECIMAL-exact sums; the tie-safe output keys on (type, ts, id)."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window
    ts = F.unix_timestamp("ts")
    base = ev.select("event_type", "event_id", ts.alias("sec"),
                     F.col("value").cast("decimal(28,8)").alias("v"))
    w = (Window.partitionBy("event_type").orderBy("sec")
         .rangeBetween(-3600, 0))
    return (base
            .withColumn("mov_sum", F.sum("v").over(w).cast("decimal(28,8)"))
            .withColumn("mov_n", F.count(F.lit(1)).over(w))
            # mov_sum emitted as double: matches the dtype the twin's
            # DECIMAL lands as in the driver's canon frame
            .select("event_type", "event_id", "sec",
                    F.col("mov_sum").cast("double").alias("mov_sum"),
                    "mov_n")
            .orderBy("event_type", "sec", "event_id"))


SQL_MOVING_AVG = """
SELECT event_type, event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       CAST(sum(CAST(value AS DECIMAL(28,8))) OVER w AS DECIMAL(28,8))
         AS mov_sum,
       CAST(count(*) OVER w AS BIGINT) AS mov_n
FROM events
WINDOW w AS (PARTITION BY event_type
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_type, sec, event_id
"""


def q_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT surface: customers ordering in 1995 vs 1996
    — (both years) intersect, (1995 only) except — tagged and
    unioned.  Set semantics (DISTINCT) exactly as ANSI defines."""
    o = _t(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    c95 = o.where(y == 1995).select("o_custkey")
    c96 = o.where(y == 1996).select("o_custkey")
    both = c95.intersect(c96).withColumn("tag", F.lit("both"))
    only95 = (c95.subtract(c96)          # EXCEPT DISTINCT, ANSI
              .withColumn("tag", F.lit("only_1995")))
    return both.unionByName(only95).orderBy("tag", "o_custkey")


SQL_SET_OPS = """
WITH c95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     c96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
UNION ALL
SELECT o_custkey, 'only_1995' AS tag FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
ORDER BY tag, o_custkey
"""


# ---------------------------------------------------------------------------
# Embedding per-dimension stats (similarity.embedding_dim_stats)
# ---------------------------------------------------------------------------

def q_embedding_stats(spark, sf_dir):
    """Per-(label, dim) normalization constants over the embeddings
    table: integer-quantized components, exact-integer sum/sumsq
    accumulators (partition-order-free), float mean/var derived once
    with fixed parenthesization."""
    from ..operators.similarity import embedding_dim_stats
    e = _t(spark, sf_dir, "embeddings")
    return (embedding_dim_stats(e, "embedding", ["label"])
            .orderBy("label", "dim"))


SQL_EMBEDDING_STATS = """
WITH ex AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e7) AS BIGINT) AS x7
  FROM embeddings
), agg AS (
  SELECT label, CAST(dim AS INT) AS dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x7) AS BIGINT) AS sum7,
         CAST(sum(x7 * x7) AS BIGINT) AS sumsq
  FROM ex GROUP BY label, dim
)
SELECT label, dim, n, sum7, sumsq,
       CAST(round(CAST(sum7 AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
         AS mean7,
       CAST(round((CAST(sumsq AS DOUBLE)
                   - CAST(sum7 AS DOUBLE) * CAST(sum7 AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)) AS BIGINT) AS var14
FROM agg ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# CMS join-size estimation (sketches.cms_join_size)
# ---------------------------------------------------------------------------

def q_cms_join_size(spark, sf_dir):
    """Estimate |orders JOIN lineitem ON orderkey| from two Count-Min
    sketches without touching either table again — next to the exact
    join size in the same row.  The estimate is the min over hash rows
    of the bucket-wise counter inner product (upper bound by
    construction; the CMS guarantee est >= exact is visible)."""
    from ..operators.sketches import cms_join_size, cms_sketch
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"))
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k"))
    est = cms_join_size(cms_sketch(o, "k"), cms_sketch(li, "k"))
    exact = (o.join(li, "k")
             .agg(F.count(F.lit(1)).alias("exact")))
    # 1-row x 1-row combine via union + re-aggregate: any join on a
    # constant key constant-folds back into the lint-forbidden
    # BroadcastNestedLoopJoin, so don't join at all
    a = est.select("est", "rows", F.lit(None).cast("long").alias("exact"))
    b = exact.select(F.lit(None).cast("long").alias("est"),
                     F.lit(None).cast("array<long>").alias("rows"),
                     "exact")
    return (a.unionByName(b)
            .agg(F.max("est").alias("est"),
                 F.flatten(F.collect_list("rows")).alias("rows"),
                 F.max("exact").alias("exact")))


def _sql_cms_join_size() -> str:
    from ..operators.sketches import cms_bucket_sql
    depth, width = 4, 1024
    def sk(src, key):
        counters = " UNION ALL ".join(
            f"SELECT {j} AS row, {cms_bucket_sql(key, j, width)} AS bucket, "
            f"1::BIGINT AS w FROM {src}" for j in range(depth))
        return (f"SELECT row, bucket, CAST(sum(w) AS BIGINT) AS cnt "
                f"FROM ({counters}) GROUP BY row, bucket")
    return f"""
WITH ok AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
lk AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
sa AS ({sk('ok', 'k')}),
sb AS ({sk('lk', 'k')}),
ip AS (
  SELECT sa.row, CAST(sum(sa.cnt * sb.cnt) AS BIGINT) AS ip
  FROM sa JOIN sb USING (row, bucket) GROUP BY sa.row
),
ex AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM ok JOIN lk USING (k))
SELECT CAST(min(ip) AS BIGINT) AS est,
       list_sort(list(ip)) AS rows,
       (SELECT exact FROM ex) AS exact
FROM ip
"""


# ---------------------------------------------------------------------------
# Cohort retention matrix — the canonical product-analytics rollup.
# ---------------------------------------------------------------------------

def q_retention(spark, sf_dir):
    """(cohort_day, day_offset, n_users): users grouped by first-seen
    day, counted on each later active day.  Two hash-aggs (first-seen
    per user; distinct user-day pairs) + one join on user_id — the
    shape that scales: no window over raw events, the join key is the
    user id, and the matrix is bounded by days^2."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    active = (ev.select(F.col("user_id"), day.alias("day"))
              .distinct())
    first = (active.groupBy("user_id")
             .agg(F.min("day").alias("cohort_day")))
    return (active.join(first, "user_id")
            .groupBy("cohort_day",
                     F.datediff(F.col("day"), F.col("cohort_day"))
                     .cast("long").alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy("cohort_day", "day_offset"))


SQL_RETENTION = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), first AS (
  SELECT user_id, min(day) AS cohort_day FROM active GROUP BY user_id
)
SELECT cohort_day,
       CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# HLL set algebra: audience overlap via inclusion-exclusion
# ---------------------------------------------------------------------------

def q_hll_overlap(spark, sf_dir):
    """Distinct-user overlap between click and view events estimated
    from HLL registers alone: est(A), est(B), est(A|B) via register
    max-merge, overlap = estA + estB - estAB — next to the exact
    intersection.  Intersection is NOT a register operation; this
    inclusion-exclusion composition is the standard (and only) sketch
    answer, with error governed by the union's standard error."""
    from ..operators.sketches import hll_estimate, hll_merge, hll_sketch
    ev = _t(spark, sf_dir, "events")
    k = F.col("user_id").cast("string").alias("k")
    a = ev.where(F.col("event_type") == "click").select(k)
    b = ev.where(F.col("event_type") == "view").select(k)
    ska, skb = hll_sketch(a, "k"), hll_sketch(b, "k")
    est_a = hll_estimate(ska).select(F.col("est").alias("est_a"))
    est_b = hll_estimate(skb).select(F.col("est").alias("est_b"))
    est_u = (hll_estimate(hll_merge(ska, skb))
             .select(F.col("est").alias("est_union")))
    exact = (a.intersect(b)
             .agg(F.count(F.lit(1)).alias("exact_overlap")))

    def tag(df):
        out = []
        for c in ("est_a", "est_b", "est_union", "exact_overlap"):
            out.append(F.col(c) if c in df.columns
                       else F.lit(None).cast("long").alias(c))
        return df.select(*out)

    merged = (tag(est_a).unionByName(tag(est_b))
              .unionByName(tag(est_u)).unionByName(tag(exact))
              .agg(F.max("est_a").alias("est_a"),
                   F.max("est_b").alias("est_b"),
                   F.max("est_union").alias("est_union"),
                   F.max("exact_overlap").alias("exact_overlap")))
    return merged.select(
        "est_a", "est_b", "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union"))
        .alias("est_overlap"),
        "exact_overlap")


def _sql_hll_overlap() -> str:
    from ..operators.sketches import hll_estimate_sql, hll_sketch_sql
    ska = hll_sketch_sql(
        "(SELECT CAST(user_id AS VARCHAR) AS k FROM events "
        "WHERE event_type = 'click')", "k", [])
    skb = hll_sketch_sql(
        "(SELECT CAST(user_id AS VARCHAR) AS k FROM events "
        "WHERE event_type = 'view')", "k", [])
    return f"""
WITH ra AS ({ska}),
rb AS ({skb}),
ru AS (
  SELECT reg, CAST(max(rho) AS INT) AS rho
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY reg
),
ea AS ({hll_estimate_sql('ra', [])}),
eb AS ({hll_estimate_sql('rb', [])}),
eu AS ({hll_estimate_sql('ru', [])}),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM (
    SELECT CAST(user_id AS VARCHAR) AS k FROM events
    WHERE event_type = 'click'
    INTERSECT
    SELECT CAST(user_id AS VARCHAR) AS k FROM events
    WHERE event_type = 'view')
)
SELECT ea.est AS est_a, eb.est AS est_b, eu.est AS est_union,
       ea.est + eb.est - eu.est AS est_overlap, ex.exact_overlap
FROM ea, eb, eu, ex
"""


# ---------------------------------------------------------------------------
# Distributed convex hull (spark_joins.convex_hull)
# ---------------------------------------------------------------------------

def q_convex_hull(spark, sf_dir):
    """Extreme points of the 25 nation diamond centers, computed
    hull-of-hulls (each partition pre-reduces to its partial hull —
    the associative-aggregate shape).  The oracle is the integer
    brute force: a point is non-extreme iff some triangle of three
    OTHER points covers it (all three cross products one sign,
    boundary inclusive)."""
    from ..operators.spark_joins import convex_hull
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    # quadratic synth: a purely linear one puts all 25 points on a few
    # parallel lattice lines (degenerate hull)
    pts = n.select(
        ((k * k * 433 + k * 7919) % 18000 - 9000).cast("long").alias("x"),
        ((k * k * 389 + k * 104729) % 18000 - 9000).cast("long").alias("y"))
    return convex_hull(pts).orderBy("x", "y")


SQL_CONVEX_HULL = """
WITH pts AS (
  SELECT DISTINCT
    CAST((n_nationkey*n_nationkey*433 + n_nationkey*7919) % 18000 - 9000
         AS BIGINT) AS x,
    CAST((n_nationkey*n_nationkey*389 + n_nationkey*104729) % 18000 - 9000
         AS BIGINT) AS y
  FROM nation
),
-- p is covered by triangle (a,b,c) of OTHER points iff p is in
-- conv{a,b,c}: same-sign cross products, where the all-zero case
-- (identity d1+d2+d3 = 2*area(abc): zero-area triangles can only
-- produce all-zero, i.e. p collinear with a,b,c) additionally
-- requires p inside the collinear points' bbox - without that, a
-- point on the same lattice line but OUTSIDE the segment would be
-- wrongly covered
covered AS (
  SELECT DISTINCT p.x, p.y
  FROM pts p, pts a, pts b, pts c
  WHERE (a.x, a.y) <> (p.x, p.y) AND (b.x, b.y) <> (p.x, p.y)
    AND (c.x, c.y) <> (p.x, p.y)
    AND ((a.x, a.y) < (b.x, b.y)) AND ((b.x, b.y) < (c.x, c.y))
    AND (
      (((b.x-a.x)*(p.y-a.y) - (b.y-a.y)*(p.x-a.x) >= 0
        AND (c.x-b.x)*(p.y-b.y) - (c.y-b.y)*(p.x-b.x) >= 0
        AND (a.x-c.x)*(p.y-c.y) - (a.y-c.y)*(p.x-c.x) >= 0)
       OR
       ((b.x-a.x)*(p.y-a.y) - (b.y-a.y)*(p.x-a.x) <= 0
        AND (c.x-b.x)*(p.y-b.y) - (c.y-b.y)*(p.x-b.x) <= 0
        AND (a.x-c.x)*(p.y-c.y) - (a.y-c.y)*(p.x-c.x) <= 0))
      AND NOT (
        (b.x-a.x)*(p.y-a.y) - (b.y-a.y)*(p.x-a.x) = 0
        AND (c.x-b.x)*(p.y-b.y) - (c.y-b.y)*(p.x-b.x) = 0
        AND (a.x-c.x)*(p.y-c.y) - (a.y-c.y)*(p.x-c.x) = 0
        AND NOT (p.x BETWEEN least(a.x, b.x, c.x) AND greatest(a.x, b.x, c.x)
                 AND p.y BETWEEN least(a.y, b.y, c.y)
                             AND greatest(a.y, b.y, c.y)))
    )
)
SELECT x, y FROM pts
EXCEPT SELECT x, y FROM covered
ORDER BY x, y
"""


# ---------------------------------------------------------------------------
# Classic relational additions: TPC-H Q10 shape + a correlated scalar
# subquery (Catalyst decorrelation surface)
# ---------------------------------------------------------------------------

def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    4-way join (customer x orders x lineitem(filtered) x broadcast
    nation), DECIMAL-exact revenue, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(28,8)")
           * (F.lit(1.0) - F.col("l_discount")).cast("decimal(28,8)"))
    return (li.where(F.col("l_returnflag") == "R")
            .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(rev).cast("decimal(28,8)").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20)
            # top-20 decided on the exact DECIMAL; the final double cast
            # only aligns the emitted dtype with the driver's canon frame
            .select("c_custkey", "c_name", "n_name",
                    F.col("revenue").cast("double").alias("revenue"),
                    "n_items"))


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))
                * CAST(1.0 - l_discount AS DECIMAL(28,8)))
            AS DECIMAL(28,8)) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_correlated_subquery(spark, sf_dir):
    """Parts whose cheapest sale is below 30% of the part's average
    sale price — TWO correlated scalar subqueries Catalyst
    decorrelates into aggregates + joins (never a per-row loop).  The
    threshold is the exact cross-multiplication
    min*10*n < 3*sum over DECIMAL(28,8), so no float (or decimal
    division scale rule) ever sits on the decision boundary."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_cs")
    return spark.sql("""
        SELECT l_partkey,
               -- decision boundary stays integer-exact below; the final
               -- DOUBLE cast aligns the emitted dtype with the driver's
               -- canon frame (duckdb DECIMAL -> float64)
               CAST(CAST(min_price AS DECIMAL(28,8)) AS DOUBLE)
                 AS min_price
        FROM (
          SELECT l_partkey,
                 min(CAST(l_extendedprice AS DECIMAL(28,8))) AS min_price
          FROM li_cs GROUP BY l_partkey
        ) m
        WHERE min_price * 10 *
              (SELECT count(*) FROM li_cs i
               WHERE i.l_partkey = m.l_partkey)
              < 3 * (SELECT sum(CAST(l_extendedprice AS DECIMAL(28,8)))
                     FROM li_cs i WHERE i.l_partkey = m.l_partkey)
        ORDER BY l_partkey
    """)


SQL_CORRELATED = """
SELECT l_partkey, CAST(min_price AS DECIMAL(28,8)) AS min_price
FROM (
  SELECT l_partkey,
         min(CAST(l_extendedprice AS DECIMAL(28,8))) AS min_price
  FROM lineitem GROUP BY l_partkey
) m
WHERE min_price * 10 *
      (SELECT count(*) FROM lineitem i WHERE i.l_partkey = m.l_partkey)
      < 3 * (SELECT sum(CAST(l_extendedprice AS DECIMAL(28,8)))
             FROM lineitem i WHERE i.l_partkey = m.l_partkey)
ORDER BY l_partkey
"""
