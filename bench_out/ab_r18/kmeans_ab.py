"""Same-JVM interleaved A/B: ml_kmeans_lloyd assignment shapes
(VERDICT r17 item 1a).

old = r16 broadcast-cross-join + groupBy struct-min argmin (one corpus
      shuffle per iteration);
new = shipped r17 map-side F.least argmin over driver-known centroids
      (zero corpus shuffles per iteration).

Usage: python kmeans_ab.py [sf_dir]   (default /root/testdata/sf0.1)
"""
import sys, time

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark import StorageLevel

from aws_etl_bank_spark.session import get_spark
from aws_etl_bank_spark.sources.testdata import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _quantize(vec, scale):
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale
                                              + F.lit(0.5)))


def _l2sq_ordered(v, c):
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a.cast("double") - b)
                   * (a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def lloyd(spark, corpus, variant, k=4, iters=2, scale=1000,
          vec_col="embedding", id_col="vec_id"):
    q = corpus.select(F.col(id_col).alias("__km_id"),
                      _quantize(F.col(vec_col), scale).alias("__km_v"))
    q = q.persist(StorageLevel.MEMORY_AND_DISK)
    seed_rows = q.orderBy("__km_id").limit(k).collect()
    cents = [(i, [float(x) for x in r["__km_v"]])
             for i, r in enumerate(seed_rows)]

    def assign_new(cent_list):
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

    def assign_old(cent_list):
        cent_df = spark.createDataFrame(
            cent_list, "__km_cid int, __km_c array<double>")
        return (q.join(F.broadcast(cent_df), F.lit(True))
                .withColumn("__km_d",
                            _l2sq_ordered(F.col("__km_v"), F.col("__km_c")))
                .groupBy("__km_id")
                .agg(F.min(F.struct("__km_d", "__km_cid"))["__km_cid"]
                     .alias("cid"),
                     F.first("__km_v").alias("__km_v")))

    assign = assign_new if variant == "new" else assign_old
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
                     .collect())
        cents = [(r["cid"], [float(x) for x in r["__km_c"]])
                 for r in sorted(mean_rows, key=lambda r: r["cid"])]

    out = assign(cents).select(F.col("__km_id").alias(id_col),
                               F.col("cid").cast("int").alias("cid"))
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    q.unpersist()
    return time.time() - t0


def main():
    spark = get_spark("kmeans_ab")
    spark.sparkContext.setLogLevel("OFF")
    from bench import calibration_probe

    emb = load_table(spark, SF, "embeddings")
    res = {"old": [], "new": []}
    # warmup both shapes (wall includes the full call: seeds + 2 iters
    # + final assign, timed around the whole function)
    for v in ("old", "new"):
        t0 = time.time()
        lloyd(spark, emb, v)
        print(f"warmup {v}: {time.time()-t0:.3f}", flush=True)
    probes = [round(calibration_probe(spark), 3)]
    for rep in range(5):
        for v in ("old", "new"):
            t0 = time.time()
            lloyd(spark, emb, v)
            res[v].append(round(time.time() - t0, 3))
        probes.append(round(calibration_probe(spark), 3))
    for v in ("old", "new"):
        ss = sorted(res[v])
        print(v, "median", ss[len(ss) // 2], "samples", res[v])
    print("probes", probes)
    print("sf", SF)


main()
