"""functions/graph.py: fixed-iteration PageRank."""

import pyspark.sql.functions as F
import pytest

from aws_etl_bank_spark.functions.graph import pagerank


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_one_round_hand_computed(spark):
    # symmetric chain 1-2-3: after one round pr(2)=0.05+0.85*(1/3+1/3)
    ranks = {r["id"]: r["pagerank"]
             for r in pagerank(_sym(spark, [(1, 2), (2, 3)]), iterations=1).collect()}
    assert ranks[2] == pytest.approx(0.05 + 0.85 * (2 / 3) * (1 / 3) * 2 * 1.5)
    assert ranks[1] == pytest.approx(0.05 + 0.85 * ((1 / 3) / 2))
    assert ranks[1] == ranks[3]


def test_pagerank_mass_conserved_and_hub_wins(spark):
    # star: hub 0 linked to 1..5 — hub must outrank leaves, total mass 1
    edges = _sym(spark, [(0, i) for i in range(1, 6)])
    ranks = {r["id"]: r["pagerank"] for r in pagerank(edges, iterations=5).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0)
    assert all(ranks[0] > ranks[i] for i in range(1, 6))


def test_pagerank_no_inedge_node_gets_floor(spark):
    # directed 1->2 only (2 has out-edge 2->1 to avoid dangling? no:
    # keep both out-degrees >= 1 per contract but give 3 no in-edges
    df = _sym(spark, [(1, 2)])
    extra = df.sparkSession.createDataFrame([(3, 1)], "src long, dst long")
    ranks = {r["id"]: r["pagerank"]
             for r in pagerank(df.union(extra), iterations=2).collect()}
    assert ranks[3] == pytest.approx((1 - 0.85) / 3)


def test_pagerank_empty_graph_returns_empty_frame(spark):
    # ADVICE r5: no ZeroDivisionError on an empty edge list
    from aws_etl_bank_spark.functions.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank(empty)
    assert out.columns == ["id", "pagerank"]
    assert out.count() == 0


def _tri(spark, pairs):
    from aws_etl_bank_spark.functions.graph import triangle_count
    df = spark.createDataFrame(pairs, "a long, b long")
    return triangle_count(df).collect()[0]


def test_triangle_count_k4_has_four(spark):
    # complete graph on 4 nodes: C(4,3) = 4 triangles, 6 edges
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    r = _tri(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)


def test_triangle_count_ignores_duplicates_loops_and_direction(spark):
    # one triangle given with mixed orientations, a dup edge, a loop,
    # and a dangling path edge that closes nothing
    edges = [(1, 2), (2, 1), (3, 2), (1, 3), (3, 3), (3, 4)]
    r = _tri(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 4, 1)


def test_triangle_count_hub_star_is_triangle_free(spark):
    # star around 0: hub wedges must NOT be counted as triangles
    r = _tri(spark, [(0, i) for i in range(1, 8)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (8, 7, 0)


def test_triangle_count_hub_plus_rim_edges(spark):
    # star + rim edges 1-2 and 4-5: exactly the two hub-closed triangles
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (4, 5)]
    r = _tri(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 7, 2)


def test_triangle_count_empty(spark):
    from aws_etl_bank_spark.functions.graph import triangle_count
    df = spark.createDataFrame([], "a long, b long")
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (0, 0, 0)
