"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k with the query set broadcast — one
pass over the corpus, no shuffle of corpus rows except the final top-k.
Scale path: IVF — corpus pre-assigned to centroid cells, queries probe
the ``nprobe`` nearest cells, brute force only inside probed cells.
Dot products are built-in ``zip_with``/``aggregate`` expressions
(JVM-side, codegen'd) — no UDF per row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _to_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k neighbors per query: broadcast the query set against the
    corpus, rank by (cosine desc, neighbor id asc).

    Output: (query_id, neighbor_id, rank, cosine).  Self-matches are
    excluded.  Ranking rounds cosine to 6 decimals before ordering so the
    result is stable across engines/float summation orders."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.round("cosine", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
                F.round("cosine", 4).alias("cosine"))
    )


def train_centroids(corpus: DataFrame, n_cells: int = 16,
                    vec_col: str = "embedding", seed: int = 7,
                    max_iter: int = 20) -> DataFrame:
    """(cell_id, centroid array<double>) from k-means|| over the corpus
    (``pyspark.ml.clustering.KMeans``).  Distributed training; only the
    ``n_cells`` centers come back to the driver, so the result is a tiny
    broadcastable frame regardless of corpus size."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(array_to_vector(_to_double(F.col(vec_col))).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter, initMode="k-means||").fit(feat)
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return corpus.sparkSession.createDataFrame(rows, "cell_id long, centroid array<double>")


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int, n_cells: int = 16,
             nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: IVF.  Corpus shuffles once on cell id; queries
    probe ``nprobe`` cells so each query scans ~nprobe/n_cells of the
    corpus.

    ``centroids`` — (cell_id, centroid array<double>), e.g. from
    :func:`train_centroids` — controls cell quality.  The default is a
    deterministic stand-in (the ``n_cells`` lowest-id corpus vectors):
    reproducible without a training job, which keeps the oracle-checked
    registry path stable; trained centroids give better-balanced cells
    and higher recall at the same nprobe."""
    if centroids is None:
        centroids = (
            corpus.orderBy(id_col).limit(n_cells)
            .select(F.col(id_col).alias("cell_id"), _to_double(F.col(vec_col)).alias("centroid"))
        )
    else:
        centroids = centroids.select(
            F.col("cell_id"), _to_double(F.col("centroid")).alias("centroid")
        )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv"))

    def nearest_cells(df, vcol, out, n):
        scored = df.join(F.broadcast(centroids), F.lit(True)).withColumn(
            "csim", _dot(F.col(vcol), F.col("centroid")) / (_norm(F.col(vcol)) * _norm(F.col("centroid")))
        )
        w = Window.partitionBy(df.columns[0]).orderBy(F.round("csim", 6).desc(), F.col("cell_id"))
        return scored.withColumn("crank", F.row_number().over(w)).filter(F.col("crank") <= n).drop("csim", "crank", "centroid")

    assigned = nearest_cells(c, "cv", "cell_id", 1)
    q = queries.select(F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv"))
    probed = nearest_cells(q, "qv", "cell_id", nprobe)
    scored = (
        assigned.join(probed, "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.round("cosine", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
                F.round("cosine", 4).alias("cosine"))
    )
