"""Lexical relevance ranking: Okapi BM25 over a document corpus.

Classic training-data curation step (rank corpus docs against a probe
query, e.g. for targeted subset selection or retrieval-quality audits).
Everything is built-in Catalyst expressions — tokenize with
``split(lower(text))``, term/document statistics as hash aggregations
with map-side combine, the per-term document frequencies and the
(1-row) corpus stats broadcast back.  No window, no UDF, no all-pairs
anything: shuffle volume is O(tokens matching the query) + one
doc-keyed join, so the plan survives an arbitrary corpus size.

Formula (Robertson/Sparck-Jones idf, the Lucene variant — always
positive): idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); score(d) =
sum over query terms of idf * tf*(k1+1) / (tf + k1*(1 - b + b*|d|/avgdl)).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: tokenizer shared with the DuckDB oracle (plans/registry_llm.py):
#: lowercase, split on non-alphanumeric runs, drop empties
_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col),
                  F.explode(F.split(F.lower(F.col(text_col)),
                                    _TOKEN_SPLIT)).alias("t"))
        .filter(F.col("t") != "")
    )


def bm25_scores(df: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75,
                round_to: int = 4) -> DataFrame:
    """(id, score, n_terms) for every document matching at least one
    query term; ``n_terms`` is how many distinct query terms hit."""
    toks = _tokens(df, text_col, id_col)
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("doclen"))
    stats = (
        df.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(doclen.agg(F.avg("doclen").alias("avgdl")))
    )
    tf = (
        toks.filter(F.col("t").isin([t.lower() for t in query_terms]))
        .groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl"))
    return (
        tf.join(F.broadcast(dfreq), "t")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__w", idf * F.col("tf") * (k1 + 1.0) / denom)
        .groupBy(id_col)
        .agg(F.round(F.sum("__w"), round_to).alias("score"),
             F.countDistinct("t").alias("n_terms"))
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Global top-k by BM25 score, deterministically tie-broken by id —
    orderBy+limit, which Spark executes as per-partition TakeOrdered
    (no full sort shuffle)."""
    scored = bm25_scores(df, query_terms, text_col, id_col, k1, b)
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    )
