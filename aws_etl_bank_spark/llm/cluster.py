"""Distributed k-means (Lloyd iterations) as pure DataFrame algebra —
the ORACLE-CHECKABLE sibling of similarity.train_centroids (which wraps
pyspark.ml.KMeans and is therefore seed/implementation-defined).

Reference scope: the engine this repo re-expresses exposes clustering
only through its ML bridge; this module exists for the LLM-pipeline
brief (embedding-space curation: IVF cell training, semantic dedup
seeding) with every arithmetic step chosen so a second engine can
reproduce it BIT-FOR-BIT:

- components quantize to integers (``floor(x*scale + 0.5)``, the
  round-half-up canon) so per-cluster component SUMS are exact int64
  hash-aggs — order-free, overflow-checked by magnitude;
- centroid means are ONE IEEE division of two exactly-known numbers
  (correctly rounded, hence engine-identical);
- squared-distance folds run left-to-right (``F.aggregate`` here,
  ``list_reduce`` in the DuckDB oracle); IEEE ``0.0 + x == x`` makes the
  seeded and unseeded folds associate identically;
- argmin ties break on centroid id via a (dist, cid) struct-min.

Scale shape (the 100 TB posture): the corpus is touched once per
iteration — assignment is a BROADCAST of k centroids (no shuffle),
the update is one posexplode + (cid, pos) hash-agg whose result is
k×dim rows; only those k×dim means come to the driver between
iterations (the bounded-collect convention PQ codebooks already use).
Empty clusters drop out of the update, identically in both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _quantize(vec: Column, scale: int) -> Column:
    """float array → int64 array via the round-half-up canon (exact and
    engine-identical: cast-to-double is exact, *scale and +0.5 are
    correctly rounded, floor is exact)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale
                                              + F.lit(0.5)))


def _l2sq_ordered(v: Column, c: Column) -> Column:
    """Left-to-right fold of Σ (v_i − c_i)² with v int64 and c double —
    every step correctly rounded in a fixed order, so two engines agree
    bitwise."""
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a.cast("double") - b)
                   * (a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def lloyd_assign(corpus: DataFrame, k: int = 4, iters: int = 2,
                 scale: int = 1000, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """``iters`` full Lloyd steps (assign + update) from the k
    smallest-id vectors as seeds, then a FINAL assignment with the
    resulting centroids → (id, cid).  Deterministic end to end: seed
    choice by id, integer component sums, tie-broken argmin."""
    q = corpus.select(F.col(id_col).alias("__km_id"),
                      _quantize(F.col(vec_col), scale).alias("__km_v"))
    from pyspark import StorageLevel
    q = q.persist(StorageLevel.MEMORY_AND_DISK)

    # deterministic seeds: the k smallest ids, cid in id order (k rows
    # to the driver — bounded, like a PQ codebook fetch)
    seed_rows = q.orderBy("__km_id").limit(k).collect()
    cents = [(i, [float(x) for x in r["__km_v"]])
             for i, r in enumerate(seed_rows)]

    def assign(cent_list):
        # centroids are driver-known between iterations, so the argmin
        # is a pure MAP-SIDE expression: one (dist, cid) struct per
        # centroid, F.least = the same lexicographic (dist, cid) min as
        # the former min(struct) aggregate.  The previous form — a
        # k-way broadcast cross join + groupBy(__km_id) struct-min —
        # shuffled the whole (id, vector) corpus once per iteration for
        # an argmin that needs no data movement at all (r17, guide
        # §2.4); distances still fold left-to-right via _l2sq_ordered,
        # so every value is bit-identical to the joined form.
        scored = [
            F.struct(
                _l2sq_ordered(
                    F.col("__km_v"),
                    F.array(*[F.lit(float(x)) for x in c])).alias("__km_d"),
                F.lit(int(cid)).alias("__km_cid"))
            for cid, c in cent_list
        ]
        arg = scored[0] if len(scored) == 1 else F.least(*scored)
        return q.select("__km_id", "__km_v", arg["__km_cid"].alias("cid"))

    for _ in range(iters):
        a = assign(cents)
        upd = (a.select("cid", F.posexplode("__km_v")
                        .alias("__km_pos", "__km_comp"))
               .groupBy("cid", "__km_pos")
               .agg(F.sum(F.col("__km_comp").cast("long")).alias("__km_s"),
                    F.count(F.lit(1)).alias("__km_n"))
               .select("cid", "__km_pos",
                       (F.col("__km_s").cast("double")
                        / F.col("__km_n").cast("double")).alias("__km_m")))
        mean_rows = (upd.groupBy("cid")
                     .agg(F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("__km_pos", "__km_m"))),
                         lambda x: x["__km_m"]).alias("__km_c"))
                     .collect())  # k×dim doubles — bounded driver traffic
        cents = [(r["cid"], [float(x) for x in r["__km_c"]])
                 for r in sorted(mean_rows, key=lambda r: r["cid"])]

    out = assign(cents).select(F.col("__km_id").alias(id_col),
                               F.col("cid").cast("int").alias("cid"))
    q.unpersist()
    return out
