"""Iterative graph algorithms over edge lists.

Connected components (min-label propagation to fixpoint) lives in
``llm/dedup.py`` next to its dedup consumers; this module holds the
fixed-iteration algorithms whose round count is a parameter rather than
a convergence probe — PageRank being the canonical one.

Scale shape shared by both: the driver holds ONLY loop control; each
round is an equi-join + aggregate that shuffles on node id (map-side
partial aggregation applies), and ``localCheckpoint`` truncates the
growing lineage so round N's plan does not replay rounds 1..N-1.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 3, damping: float = 0.85,
             assume_distinct: bool = False,
             broadcast_ranks: bool = False,
             symmetric: bool = False) -> DataFrame:
    """PageRank over a directed edge list, exactly ``iterations`` rounds
    of the power method: ``pr'(v) = (1-d)/N + d · Σ pr(u)/outdeg(u)``
    over in-neighbors ``u``.

    Every node is expected to have out-degree ≥ 1 (symmetrize an
    undirected graph first: dangling-node mass is NOT redistributed, so
    with dangling nodes the scores no longer sum to 1).  Nodes with no
    in-edges stay at the ``(1-d)/N`` floor.

    A fixed round count (the common production choice — convergence in
    rank ORDER long precedes convergence in value) keeps the computation
    deterministic and oracle-checkable against the same unrolled
    recurrence in SQL.

    Pregel-style plan: the weighted edge list (edge + source out-degree)
    is joined to the degree table ONCE, hash-partitioned on ``src`` and
    persisted — every round then reuses that cached partitioning, so the
    per-round Exchange moves only the (node-sized) rank table, never the
    edge list.  Lineage is truncated with an eager localCheckpoint every
    ``checkpoint_interval`` rounds rather than every round — short loops
    run as one job with a 3-join-deep plan instead of paying a
    materialization per round.

    ``assume_distinct``: skip the defensive edge dedup when the caller
    already guarantees distinct (src, dst) rows — one full edge shuffle
    saved.  ``broadcast_ranks``: broadcast the rank table into each
    round's join instead of shuffling it — the per-round join then has
    NO exchange and no sort at all.  Correct only while the node set
    fits a broadcast (~10 M nodes); leave False at graph scale, where
    the cached edge partitioning path is the right plan.
    ``symmetric``: declare that every node appears as a source (true for
    any symmetrized graph) — the node set then falls out of the degree
    aggregate for free instead of a second union+distinct edge
    shuffle."""
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ew = e.join(deg, "src")
    if not broadcast_ranks:
        # pin the edge partitioning the per-round joins will reuse; with
        # broadcast ranks the join needs no particular partitioning
        ew = ew.repartition("src")
    ew = ew.persist()
    if symmetric:
        nodes = deg.select(F.col("src").alias("id")).persist()
    else:
        nodes = (ew.select(F.col("src").alias("id"))
                 .union(ew.select(F.col("dst").alias("id")))
                 .distinct().persist())
    n = nodes.count()
    if n == 0:
        # empty edge frame: return an empty (id, pagerank) result with
        # the right schema instead of ZeroDivisionError on the driver
        return nodes.withColumn("pagerank", F.lit(0.0))
    ranks = nodes.withColumn("pagerank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    checkpoint_interval = 5
    for i in range(iterations):
        r = ranks.select(F.col("id").alias("src"), "pagerank")
        if broadcast_ranks:
            r = F.broadcast(r)
        contrib = (
            ew.join(r, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("pagerank") / F.col("__deg")).alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select("id", (F.lit(base)
                           + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                           ).alias("pagerank"))
        )
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    # materialize the final ranks BEFORE dropping the cached inputs they
    # are built from, so callers never silently recompute the edge join
    ranks = ranks.localCheckpoint()
    ew.unpersist()
    nodes.unpersist()
    return ranks
