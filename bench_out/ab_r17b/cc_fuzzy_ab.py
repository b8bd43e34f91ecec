"""Same-JVM interleaved A/B: old vs new min-label CC and fuzzy_pairs_ed1.

Fixtures are the real registry entries' inputs at sf0.1; implementations
are copied verbatim (old = HEAD, new = working tree).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from aws_etl_bank_spark.session import get_spark
from aws_etl_bank_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.1"


def cc_old(pairs, max_iterations=20):
    e = pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
    edges = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    edges = edges.persist()
    labels = edges.select(F.col("s").alias("id")).distinct().withColumn("comp", F.col("id"))
    labels = labels.localCheckpoint(eager=False)
    converged = False
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(labels.select(F.col("id").alias("d"), "comp"), "d")
            .groupBy("s").agg(F.min("comp").alias("ncomp"))
            .withColumnRenamed("s", "id")
        )
        new_labels = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            (F.coalesce("ncomp", "comp") < F.col("comp")).alias("_changed"),
        )
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    assert converged
    return labels.select("id", F.col("comp").alias("component"))


def cc_new(pairs, max_iterations=20):
    from aws_etl_bank_spark.llm.dedup import connected_components
    return connected_components(pairs, max_iterations=max_iterations)


def fuzzy_old(df, text_col, id_col):
    s = F.col(text_col)
    variants = F.concat(
        F.array(s),
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(s.substr(F.lit(1), i - F.lit(1)),
                               s.substr(i + F.lit(1), F.length(s)))))
    sig = (df.select(F.col(id_col).alias("__id"), s.alias("__t"),
                     F.explode(variants).alias("__v"))
           .select("__id", "__t", F.xxhash64("__v").alias("__h"))
           .dropDuplicates(["__id", "__h"]))
    a = sig.select(F.col("__id").alias("id_a"), F.col("__t").alias("text_a"),
                   F.col("__h").alias("__h"))
    b = sig.select(F.col("__id").alias("id_b"), F.col("__t").alias("text_b"),
                   F.col("__h").alias("__h"))
    return (
        a.join(b, "__h")
        .where(F.col("id_a") < F.col("id_b"))
        .drop("__h").dropDuplicates(["id_a", "id_b"])
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .where(F.col("dist") <= 1)
    )


def fuzzy_new(df, text_col, id_col):
    from aws_etl_bank_spark.llm.dedup import fuzzy_pairs_ed1
    return fuzzy_pairs_ed1(df, text_col, id_col)


def fx_cc(spark):
    src = (load_table(spark, SF, "customer")
           .select(F.col("c_custkey").cast("long").alias("k"))
           .filter(F.col("k") % 10 <= 2))
    return src.select(F.col("k").alias("id_a"), (F.col("k") + 1).alias("id_b"))


def fx_cust(spark):
    return load_table(spark, SF, "customer")


def run(tag, fn):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main():
    spark = get_spark("cc_fuzzy_ab")
    spark.sparkContext.setLogLevel("OFF")
    from bench import calibration_probe

    cases = {
        "cc_old": lambda: cc_old(fx_cc(spark)),
        "cc_new": lambda: cc_new(fx_cc(spark)),
        "fuzzy_old": lambda: fuzzy_old(fx_cust(spark), "c_name", "c_custkey"),
        "fuzzy_new": lambda: fuzzy_new(fx_cust(spark), "c_name", "c_custkey"),
        "entity_old": lambda: cc_old(
            fuzzy_old(fx_cust(spark).where(F.col("c_custkey") % 3 == 0),
                      "c_name", "c_custkey").select("id_a", "id_b")),
        "entity_new": lambda: cc_new(
            fuzzy_new(fx_cust(spark).where(F.col("c_custkey") % 3 == 0),
                      "c_name", "c_custkey").select("id_a", "id_b")),
    }
    # warmup
    for k, fn in cases.items():
        run(k, fn)
    res = {k: [] for k in cases}
    probes = [calibration_probe(spark)]
    for rep in range(5):
        for k, fn in cases.items():
            res[k].append(run(k, fn))
        probes.append(calibration_probe(spark))
    for k in cases:
        ss = sorted(res[k])
        print(k, "median", ss[len(ss)//2], "samples", res[k])
    print("probes", probes)


main()
