"""Distributed matrix decompositions over embedding columns.

The pattern (the one Spark MLlib's RowMatrix.computePrincipalComponents
uses, re-expressed on the DataFrame API): the N×d data matrix never
materializes anywhere — each partition reduces its rows to d-sized /
d×d-sized SUFFICIENT STATISTICS (count, column sums, Gram matrix) inside
one Arrow-batched pass, the ≤ num_partitions stat rows collapse on the
driver (bounded: d=64 → 4 KB per partition), and the d×d eigensolve runs
in numpy where an O(d³) dense solve belongs.  Executors never exchange
vectors; the only cross-node traffic is the tiny stat rows.  This is the
right 100 TB shape whenever d is bounded (embeddings: 64–4096) — the
alternative, a shuffle-based outer-product aggregation, moves d² doubles
per ROW instead of per PARTITION.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F  # noqa: F401  (callers compose columns)
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def covariance_stats(df: DataFrame, vec_col: str, dim: int):
    """(n, mean, covariance) of an ``array<float/double>`` column via
    per-partition Gram partials.  Returns plain numpy objects — the
    driver-side d×d world — not a DataFrame."""
    import pandas as pd

    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("g", T.ArrayType(T.DoubleType())),
    ])

    def partials(batches):
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if mat.size == 0:
                continue
            n += mat.shape[0]
            s += mat.sum(axis=0)
            g += mat.T @ mat
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    rows = df.select(vec_col).mapInPandas(partials, schema).collect()
    if not rows:
        return 0, np.zeros(dim), np.zeros((dim, dim))
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def pca_top_component(df: DataFrame, vec_col: str, dim: int):
    """Top principal component: distributed covariance (above) + an
    O(d³) numpy ``eigh`` on the driver.  Returns
    (n, top_eigenvalue, top_eigenvector, trace) — the eigenvector sign
    is normalized (first nonzero coordinate positive) so results are
    deterministic across BLAS builds."""
    n, _mean, cov = covariance_stats(df, vec_col, dim)
    if n == 0:
        return 0, 0.0, np.zeros(dim), 0.0
    vals, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if nz.size and v[nz[0]] < 0:
        v = -v
    return n, float(vals[-1]), v, float(np.trace(cov))


def jl_project(df: DataFrame, vec_col: str, id_col: str,
               in_dim: int, out_dim: int) -> DataFrame:
    """Johnson–Lindenstrauss random projection with a DETERMINISTIC ±1
    matrix (Achlioptas' database-friendly construction): out dim ``i``
    is ⟨x, r_i⟩/√out_dim with r_i[j] = ±1 decided by the parity of the
    corpus-stable Knuth hash of (i·in_dim + j).

    The 100 TB shape: the projection matrix is COMPILED INTO THE PLAN
    as literal arrays (the PQ-codebook pattern) — no broadcast, no
    join, no Python; each row maps through ``zip_with`` +
    ``aggregate`` (sequential fold, so the float sum order is fixed)
    entirely inside whole-stage codegen, zero shuffles.  Determinism
    is the point versus ``randn()`` matrices: re-runs, retries, and
    engines all agree, so downstream ANN indexes built on projected
    vectors are reproducible.  Emitted long-form (id, dim, val) for
    oracle-friendliness."""
    import math

    P, A = 1000003, 2654435761 % 1000003

    def sign(i: int, j: int) -> float:
        return 1.0 - 2.0 * ((((i * in_dim + j) % P) * A % P) % 2)

    scale = 1.0 / math.sqrt(out_dim)
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    comps = []
    for i in range(out_dim):
        r_i = F.array(*[F.lit(sign(i, j)) for j in range(in_dim)])
        dot = F.aggregate(F.zip_with(x, r_i, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, v: acc + v)
        comps.append(dot * scale)
    return (df.select(F.col(id_col), F.posexplode(F.array(*comps))
                      .alias("dim", "val"))
            .select(id_col, F.col("dim").cast("int").alias("dim"), "val"))
