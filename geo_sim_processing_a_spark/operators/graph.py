"""Connected components over a pair graph — the step a dedup pipeline
runs AFTER near-dup pair generation: pairs -> clusters -> one canonical
document per cluster.

Shape chosen for 100 TB: iterative min-label propagation (hash-min)
WITH pointer jumping — each round every vertex takes the minimum of
its own label, its neighbors' labels, and its label's label
(label values are always vertex ids, so "label of label" is a
self-join on the label frame).  Neighbor propagation alone needs
O(diameter) rounds (a 180-vertex path = 180 rounds); pointer jumping
contracts label chains exponentially, giving O(log n) rounds — the
standard large-scale CC construction.  Every round is equi-joins +
aggregates shuffling on vertex id (a component never has to fit in
memory anywhere), and the label frame is local-checkpointed per round
(iterative lineage otherwise grows the plan exponentially).  The loop
stops at the first unchanged round; max_iter is a reported backstop.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def connected_components(edges: DataFrame, left: str = "id_a",
                         right: str = "id_b", max_iter: int = 50,
                         checkpoint_every: int = 1,
                         stats: dict | None = None) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``;
    ``component`` is the smallest vertex id reachable (undirected).

    Deterministic: labels are ids, propagation takes minima — no
    iteration-order dependence, so the fixpoint is unique.

    ``checkpoint_every``: localCheckpoint the label frame every k
    rounds (default 1).  Each checkpoint truncates iterative lineage
    (otherwise the plan doubles per round) at the cost of
    materializing the labels; k>1 trades k rounds of plan growth for
    fewer materializations — worthwhile when rounds are cheap relative
    to the label frame's size.  The ``changed`` count still executes
    every round, so skipped-checkpoint rounds re-run at most k-1
    rounds of joins inside one plan.

    ``stats``: optional dict; on return carries ``rounds`` (executed
    propagation rounds) and ``converged`` — lets callers and tests
    assert the O(log n) round bound of pointer jumping empirically."""
    e = edges.select(F.col(left).alias("src"), F.col(right).alias("dst"))
    e = (e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
         .where(F.col("src") != F.col("dst"))
         .distinct()
         .localCheckpoint(eager=False))  # reused every round

    labels = (e.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id"))
              .localCheckpoint(eager=False))

    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    converged = False
    rounds = 0
    for it in range(max_iter):
        # smallest label among each vertex's neighbors
        nbr_min = (e.join(labels.withColumnRenamed("id", "src"), "src")
                   .groupBy(F.col("dst").alias("id"))
                   .agg(F.min("label").alias("nbr_label")))
        cand = (labels.join(nbr_min, "id", "left")
                .select("id", F.least(
                    F.col("label"),
                    F.coalesce("nbr_label", F.col("label"))).alias("label")))
        # pointer jump: label := label(label) (labels are vertex ids and
        # monotone non-increasing, so the jump can only improve)
        jump = cand.select(F.col("id").alias("label"),
                           F.col("label").alias("ll"))
        new_labels = (cand.join(jump, "label", "left")
                      .select("id", F.least(
                          F.col("label"),
                          F.coalesce("ll", F.col("label"))).alias("label")))
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = (new_labels.alias("n").join(labels.alias("o"), "id")
                   .where(F.col("n.label") != F.col("o.label")).count())
        labels = new_labels
        rounds = it + 1
        if changed == 0:
            converged = True
            break
    if not converged:
        _LOG.warning("connected_components: not converged after %d rounds "
                     "(graph diameter exceeds max_iter); labels are an "
                     "upper bound on the true components", max_iter)
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(pairs: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs -> per-document cluster assignment with the
    canonical (minimum-id) survivor flagged.  Documents with no
    near-dup pair are their own singleton cluster."""
    comp = connected_components(pairs)
    return (docs.select(F.col(id_col).alias("id"))
            .join(comp, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("component", F.col("id")).alias("cluster_id"))
            .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id")))


PR_SCALE = 10**12  # rank mass unit: 1 = 1e-12 of total probability


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 10, damping_pct: int = 85,
             checkpoint_every: int = 3) -> DataFrame:
    """Integer-quantized PageRank — the standard web-graph authority
    signal a curation pipeline uses for domain-level quality weighting
    (Page et al. 1999; CommonCrawl publishes exactly this per-domain).

    All arithmetic is INTEGER: ranks live in units of 1e-12 of total
    mass (PR_SCALE), each iteration computes

        contrib(s)  = rank(s) div outdeg(s)
        rank'(t)    = (15 * PR_SCALE) div (100 * |V|)
                      + (damping_pct * sum_in(t)) div 100

    with `div` = floor division on non-negative longs, so the result
    is bit-exact under ANY join/aggregation order and any engine — the
    DuckDB twin (q_pagerank) reproduces every rank to the last unit.
    Float PageRank sums doubles per target, which is
    summation-order-dependent; quantization is the same discipline as
    the bigram-LM log-prob sums (operators/lm.py).  Dangling-node mass
    is dropped (the common simplification); ranks therefore sum to
    slightly under PR_SCALE.

    Shape per iteration: edges ⋈ ranks on src (equi-join, shuffles on
    the join key), hash-agg on dst, left join back to the static node
    frame — the Pregel-lite construction whose per-round cost is
    O(|E|/p) with no per-node state assumptions; `checkpoint_every`
    truncates iterative lineage like connected_components.

    Returns (node, rank_q) with rank_q in PR_SCALE units.
    """
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct()
         .localCheckpoint(eager=False))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.count()  # bounded driver scalar (tfidf-N idiom)
    base = (15 * PR_SCALE) // (100 * n_nodes)
    r0 = PR_SCALE // n_nodes

    ranks = nodes.withColumn("rank_q", F.lit(r0).cast("long"))
    for i in range(n_iter):
        contribs = (e.join(ranks, e.src == ranks.node)
                    .join(deg, "src")
                    .select(F.col("dst").alias("node"),
                            F.expr("rank_q div deg").alias("c")))
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({damping_pct} * coalesce(s, 0))"
                                   " div 100")).alias("rank_q")))
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
