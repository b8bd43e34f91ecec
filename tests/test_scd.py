"""SCD2 merge: close-out + insert semantics, determinism under as_of."""

import pyspark.sql.functions as F

from aws_etl_bank_spark import scd


def _dim(spark):
    rows = [(1, "ann", "hanoi"), (2, "bob", "hue"), (3, "cam", "danang")]
    snap = spark.createDataFrame(rows, "cust_id long, name string, city string")
    return scd.scd2_stamp(snap, "2020-01-01")


def test_merge_closes_changed_and_inserts_new(spark):
    current = _dim(spark)
    updates = spark.createDataFrame(
        [(1, "ann", "saigon"),   # changed city → close + insert
         (2, "bob", "hue"),      # unchanged → passthrough
         (9, "dee", "hcmc")],    # new key → insert
        "cust_id long, name string, city string")
    out = scd.scd2_merge(current, updates, ["cust_id"], as_of="2024-06-01")
    rows = {(r["cust_id"], r["is_active"], str(r["record_updated_time"])): r
            for r in out.collect()}
    # closed old version of 1
    closed = rows[(1, False, "2024-06-01")]
    assert closed["city"] == "hanoi"
    # new active version of 1
    new1 = rows[(1, True, "3000-01-01")]
    assert new1["city"] == "saigon"
    # unchanged 2 and absent-from-updates 3 pass through active
    assert (2, True, "3000-01-01") in rows
    assert (3, True, "3000-01-01") in rows
    # brand-new 9 inserted active
    assert (9, True, "3000-01-01") in rows
    assert out.count() == 5


def test_merge_handles_null_first_business_column(spark):
    # presence must come from a literal marker, not business[0] IS NOT NULL:
    # an update with NULL in the first business column is still an update
    current = _dim(spark)
    updates = spark.createDataFrame(
        [(1, None, "saigon"),    # changed, name NULL → close + insert
         (9, None, "hcmc")],     # new key with NULL name → insert
        "cust_id long, name string, city string")
    out = scd.scd2_merge(current, updates, ["cust_id"], as_of="2024-06-01")
    rows = {(r["cust_id"], r["is_active"], str(r["record_updated_time"])): r
            for r in out.collect()}
    assert rows[(1, False, "2024-06-01")]["city"] == "hanoi"
    new1 = rows[(1, True, "3000-01-01")]
    assert new1["city"] == "saigon" and new1["name"] is None
    new9 = rows[(9, True, "3000-01-01")]
    assert new9["city"] == "hcmc" and new9["name"] is None
    # untouched keys pass through active
    assert (2, True, "3000-01-01") in rows and (3, True, "3000-01-01") in rows
    assert out.count() == 5


def test_merge_is_idempotent_for_same_snapshot(spark):
    current = _dim(spark)
    same = current.select("cust_id", "name", "city")
    out = scd.scd2_merge(current, same, ["cust_id"], as_of="2024-06-01")
    assert out.filter(~F.col("is_active")).count() == 0
    assert out.count() == current.count()


def test_history_rows_untouched(spark):
    current = _dim(spark)
    first = scd.scd2_merge(
        current,
        spark.createDataFrame([(1, "ann", "saigon")], "cust_id long, name string, city string"),
        ["cust_id"], as_of="2022-01-01")
    # second merge changes 1 again; the 2022 closed row must survive as-is
    second = scd.scd2_merge(
        first,
        spark.createDataFrame([(1, "ann", "hue")], "cust_id long, name string, city string"),
        ["cust_id"], as_of="2024-01-01")
    closed_dates = sorted(str(r["record_updated_time"])
                          for r in second.filter(~F.col("is_active")).collect())
    assert closed_dates == ["2022-01-01", "2024-01-01"]
    assert second.filter(F.col("is_active") & (F.col("cust_id") == 1)).collect()[0]["city"] == "hue"


def test_scd2_as_of_picks_the_version_current_on_the_date(spark):
    from aws_etl_bank_spark.scd import scd2_as_of, scd2_merge, scd2_stamp

    snap = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    dim = scd2_stamp(snap, "2020-01-01")
    upd = spark.createDataFrame([(1, "a2"), (3, "c")], "k long, name string")
    merged = scd2_merge(dim, upd, ["k"], as_of="2024-01-01")

    before = {r.k: (r.name, r.is_active)
              for r in scd2_as_of(merged, "2022-06-15").collect()}
    assert before == {1: ("a", False), 2: ("b", True)}
    after = {r.k: (r.name, r.is_active)
             for r in scd2_as_of(merged, "2024-06-15").collect()}
    assert after == {1: ("a2", True), 2: ("b", True), 3: ("c", True)}


def test_scd2_merge_plans_one_join_and_no_recompute(spark, tmp_path):
    # the merge must execute as ONE full-outer join with each input
    # scanned once (active + history from the dim, once from updates) —
    # the branched filter+union form recomputed the join per branch,
    # 9 dim scans at 3 branches
    import re
    from aws_etl_bank_spark.scd import scd2_merge, scd2_stamp

    snap = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    dim_pq, upd_pq = str(tmp_path / "dim"), str(tmp_path / "upd")
    scd2_stamp(snap, "2020-01-01").write.parquet(dim_pq)
    spark.createDataFrame([(1, "a2"), (3, "c")],
                          "k long, name string").write.parquet(upd_pq)
    merged = scd2_merge(spark.read.parquet(dim_pq),
                        spark.read.parquet(upd_pq), ["k"], as_of="2024-01-01")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 3
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 1


def test_snapshot_diff_types_and_null_safety(spark):
    from aws_etl_bank_spark.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, None), (3, 30.0, "C"), (4, 40.0, "D")],
        "k long, price double, status string")
    new = spark.createDataFrame(
        [(1, 10.0, "A"),          # unchanged -> filtered
         (2, 20.0, "B"),          # NULL -> value: update on status
         (3, None, "C"),          # value -> NULL: update on price
         (5, 50.0, "E")],         # insert; 4 deleted
        "k long, price double, status string")
    got = {r.k: r for r in
           snapshot_diff(old, new, ["k"], ["price", "status"]).collect()}
    assert set(got) == {2, 3, 4, 5}
    assert got[2].change_type == "U" and got[2].changed_cols == ["status"]
    assert got[3].change_type == "U" and got[3].changed_cols == ["price"]
    assert got[3].price is None            # new-side values carried
    assert got[4].change_type == "D" and got[4].changed_cols == []
    assert got[4].price is None
    assert got[5].change_type == "I" and got[5].price == 50.0


def test_snapshot_diff_single_join_no_window(spark):
    from aws_etl_bank_spark.scd import snapshot_diff

    old = spark.createDataFrame([(1, 1.0)], "k long, v double")
    new = spark.createDataFrame([(1, 2.0)], "k long, v double")
    plan = snapshot_diff(old, new, ["k"], ["v"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Join") == 1
