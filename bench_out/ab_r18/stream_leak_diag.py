"""Diagnose the monotonic within-JVM slowdown of streaming bench
entries (r18): run one streaming entry repeatedly in one JVM and watch
wall time, JVM heap, loaded state-store providers, and catalog temp
views.  Variants:

  plain    — entry as shipped
  cleanup  — entry + dropTempView of the memory sink after each run

Usage: python stream_leak_diag.py <entry> [reps] [variant]
"""
import gc
import sys, time

sys.path.insert(0, "/root/repo")

from aws_etl_bank_spark.session import get_spark
import __spark_entry__ as entrymod

name = sys.argv[1] if len(sys.argv) > 1 else "stream_tws_running_totals"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
variant = sys.argv[3] if len(sys.argv) > 3 else "plain"
SF = "/root/testdata/sf0.1"


def jvm_stats(spark):
    jvm = spark._sc._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    used_mb = (rt.totalMemory() - rt.freeMemory()) / 1e6
    threads = jvm.java.lang.Thread.activeCount()
    return round(used_mb), threads


def main():
    spark = get_spark("stream_leak_diag")
    spark.sparkContext.setLogLevel("OFF")
    from bench import calibration_probe

    qs = entrymod.queries()
    fn = qs[name]
    print(f"entry={name} variant={variant}")
    probes = []
    for i in range(reps):
        views_before = {t.name for t in spark.catalog.listTables()}
        t0 = time.time()
        df = fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        new_views = {t.name for t in spark.catalog.listTables()} - views_before
        if variant == "cleanup":
            for v in new_views:
                spark.catalog.dropTempView(v)
            spark._jvm.System.gc()
            gc.collect()
        heap, threads = jvm_stats(spark)
        n_views = len(spark.catalog.listTables())
        print(f"run {i}: {wall:6.3f}s heap={heap}MB threads={threads} "
              f"views={n_views} new={sorted(new_views)}", flush=True)
        if i in (0, reps // 2, reps - 1):
            probes.append(round(calibration_probe(spark), 3))
    print("probes", probes)


main()
