"""Same-JVM interleaved A/B of connected_components_star round shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import Window

from aws_etl_bank_spark.session import get_spark
from aws_etl_bank_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.1"


def star(pairs, variant, max_rounds=50):
    raw = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    nodes = (raw.select(F.col("a").alias("id"))
             .union(raw.select(F.col("b").alias("id")))
             .distinct().localCheckpoint(eager=False))
    e0 = raw.filter(F.col("a") != F.col("b"))
    edges = (e0.select(F.least("a", "b").alias("a"),
                       F.greatest("a", "b").alias("b"))
             .distinct().localCheckpoint(eager=False))
    prev_sig, converged, rounds = None, False, 0
    for _ in range(max_rounds):
        rounds += 1
        if variant == "old":
            both = edges.union(edges.select(F.col("b").alias("a"),
                                            F.col("a").alias("b")))
            mins = both.groupBy("a").agg(F.min("b").alias("mn"))
            j = both.join(mins, "a").withColumn("m", F.least("mn", F.col("a")))
            ls = (j.filter(F.col("b") > F.col("a"))
                  .select(F.col("b").alias("a"), F.col("m").alias("b"))
                  .filter(F.col("a") != F.col("b")).distinct())
            mins2 = ls.groupBy("a").agg(F.min("b").alias("m"))
            em1 = (ls.join(mins2, "a")
                   .select(F.col("b").alias("a"), F.col("m").alias("b")))
            em2 = mins2.select("a", F.col("m").alias("b"))
            edges_new = (em1.union(em2).filter(F.col("a") != F.col("b"))
                         .select(F.least("a", "b").alias("a"),
                                 F.greatest("a", "b").alias("b"))
                         .distinct().localCheckpoint(eager=False))
        else:
            r1 = edges.union(edges.select(F.col("b").alias("a"),
                                          F.col("a").alias("b"))).repartition("a")
            mins = r1.groupBy("a").agg(F.min("b").alias("mn"))
            j = (r1.join(mins.hint("shuffle_hash"), "a")
                 .withColumn("m", F.least("mn", F.col("a"))))
            r2 = (j.filter(F.col("b") > F.col("a"))
                  .select(F.col("b").alias("a"), F.col("m").alias("b"))
                  .filter(F.col("a") != F.col("b")).repartition("a"))
            ls = r2.dropDuplicates(["a", "b"])
            mins2 = ls.groupBy("a").agg(F.min("b").alias("m"))
            em1 = (ls.join(mins2.hint("shuffle_hash"), "a")
                   .select(F.col("b").alias("a"), F.col("m").alias("b")))
            em2 = mins2.select("a", F.col("m").alias("b"))
            edges_new = (em1.union(em2).filter(F.col("a") != F.col("b"))
                         .select(F.least("a", "b").alias("a"),
                                 F.greatest("a", "b").alias("b"))
                         .repartition("a").dropDuplicates(["a", "b"])
                         .localCheckpoint(eager=False))
        s = edges_new.agg(F.count(F.lit(1)).alias("n"),
                          F.sum(F.xxhash64("a", "b")).alias("h")).collect()[0]
        sig = (s["n"], s["h"])
        edges = edges_new
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    labeled = edges.select(F.col("b").alias("id"), F.col("a").alias("component"))
    rest = (nodes.join(labeled.select("id"), "id", "left_anti")
            .withColumn("component", F.col("id")))
    return labeled.unionByName(rest.select("id", "component")), rounds


def fixture(spark):
    ids = load_table(spark, SF, "embeddings").select("vec_id")
    nxt = ids.select((F.col("vec_id") + 1).alias("vec_id"))
    chain = (ids.join(nxt, "vec_id")
             .select((F.col("vec_id") - 1).alias("id_a"),
                     F.col("vec_id").alias("id_b")))
    loops = ids.select(F.col("vec_id").alias("id_a"),
                       F.col("vec_id").alias("id_b"))
    return chain.unionByName(loops)


def main():
    spark = get_spark("star_ab")
    spark.sparkContext.setLogLevel("OFF")
    from bench import calibration_probe
    # warmup both
    for v in ("old", "new"):
        df, _ = star(fixture(spark), v)
        df.write.format("noop").mode("overwrite").save()
    res = {"old": [], "new": []}
    probes = [calibration_probe(spark)]
    for rep in range(5):
        for v in ("old", "new"):
            t0 = time.time()
            df, rounds = star(fixture(spark), v)
            df.write.format("noop").mode("overwrite").save()
            res[v].append(round(time.time() - t0, 3))
        probes.append(calibration_probe(spark))
    print("rounds:", rounds)
    for v in ("old", "new"):
        ss = sorted(res[v])
        print(v, "median", ss[len(ss)//2], "samples", res[v])
    print("probes", probes)


main()
