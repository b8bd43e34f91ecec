"""Time series, ML features, graph, quality, sampling, scale patterns, streaming promotions — registry entries (formerly registry.py lines 4382-8369).

Pure mechanical move out of the single-module ``plans/registry.py``
(VERDICT r14 task 8): entry source, ``@q`` names, oracles, and the
REGISTRY insertion order are byte-identical to the pre-split layout —
``plans/registry.py`` imports the four part modules in the original
line order.  Do NOT import part modules directly; import
``aws_etl_bank_spark.plans.registry`` (all parts register on import).
"""

from __future__ import annotations

import os  # noqa: F401

import pyspark.sql.functions as F  # noqa: F401
import pyspark.sql.types as T  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from aws_etl_bank_spark.session import apply_runtime_confs  # noqa: F401
from aws_etl_bank_spark.sources.testdata import load_table  # noqa: F401
from aws_etl_bank_spark.plans.registry import (  # noqa: F401
    REGISTRY, SCRATCH, canon0, q, _scratch)

# Direct-import tripwire (ADVICE r15): registering this part outside
# registry.py's fixed four-import sequence would append its entries
# after the other parts' and silently reorder REGISTRY, which the
# driver rotation window and the COVERAGE.md ledger index into.  The
# docstring prohibition alone proved too quiet — fail loudly instead.
from aws_etl_bank_spark.plans import registry as _registry_mod  # noqa: E402

if not getattr(_registry_mod, "_LOADING_PARTS", False):
    raise ImportError(
        f"{__name__} must not be imported directly: its entries would "
        "register after the other part modules' and reorder REGISTRY "
        "against the driver rotation window; import "
        "aws_etl_bank_spark.plans.registry instead")


@q("ts_ohlc_bucket", """
WITH r AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS bucket, value,
         row_number() OVER (PARTITION BY event_type,
                                         epoch_us(ts) // 86400000000
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       ROUND(min_by(value, rn), 2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(max_by(value, rn), 2) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r GROUP BY event_type, bucket""")
def ts_ohlc_bucket(spark, sf_dir):
    """OHLC candle rollup: per (event_type, day) open/high/low/close/
    count — the financial time-series compaction (ts_bucket_rollup's
    sibling with ORDER-dependent endpoints).  One keyed window assigns
    the within-bucket sequence (deterministic (ts, event_id) order),
    and the same-key aggregation REUSES the window's exchange — one
    shuffle total; open/close are min_by/max_by over the unique rank,
    identical semantics on both engines.  Day buckets are exact
    epoch-microsecond integer division (no float epoch)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    w = (Window.partitionBy("event_type", "bucket")
         .orderBy("ts", "event_id"))
    r = (ev.withColumn("bucket", bucket)
         .withColumn("rn", F.row_number().over(w)))
    return (r.groupBy("event_type", "bucket")
            .agg(F.round(F.expr("min_by(value, rn)"), 2).alias("open"),
                 F.round(F.max("value"), 2).alias("high"),
                 F.round(F.min("value"), 2).alias("low"),
                 F.round(F.expr("max_by(value, rn)"), 2).alias("close"),
                 F.count(F.lit(1)).alias("n"))
            .select("event_type", F.col("bucket").cast("long"),
                    "open", "high", "low", "close",
                    F.col("n").cast("long").alias("n")))


@q("ts_active_users_7d", """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
wau AS (
  SELECT d.day AS day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d
  FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day)
SELECT w.day AS day, dau.dau AS dau, w.active_7d AS active_7d
FROM wau w JOIN dau ON dau.day = w.day""")
def ts_active_users_7d(spark, sf_dir):
    """Rolling 7-day distinct active users per day (the DAU/WAU
    engagement rollup) WITHOUT a range join: count-distinct composes
    with neither window frames nor partial aggregation, so the naive
    forms — a RANGE-interval window over users, or a days×events
    interval join — are respectively impossible and a broadcast-
    nested-loop.  The scalable shape: dedupe events to (day, user)
    FIRST (one hash-agg — the 100 TB row count drops to
    days×actives), then explode each pair to the ≤7 report days it
    feeds (bounded 7× of the DEDUPED frame, never of raw events), and
    count-distinct per report day.  All equi-shuffles keyed by
    (day, user); the report-day membership join broadcasts the tiny
    day dimension."""
    ev = load_table(spark, sf_dir, "events")
    # the deduped (day, user) frame feeds the explode, the day
    # dimension and the DAU agg — persist or pay three event scans
    du = (ev.select(F.to_date("ts").alias("day"), "user_id")
          .distinct().persist())
    days = du.select("day").distinct()
    exp = (du.select("user_id", "day",
                     F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"))
           .select("user_id", F.expr("date_add(day, off)").alias("day")))
    wau = (exp.join(F.broadcast(days), "day")
           .groupBy("day")
           .agg(F.countDistinct("user_id").alias("active_7d")))
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (wau.join(dau, "day")
            .select("day", F.col("dau").cast("long").alias("dau"),
                    F.col("active_7d").cast("long").alias("active_7d")))


@q("label_churn_window", """
WITH cm AS (
  SELECT DISTINCT o_custkey,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month
  FROM orders),
nxt AS (
  SELECT o_custkey,
         CAST(month - INTERVAL 1 MONTH AS DATE) AS month, 1 AS act
  FROM cm)
SELECT c.o_custkey AS o_custkey, c.month AS month,
       CAST(CASE WHEN n.act IS NULL THEN 1 ELSE 0 END AS INTEGER) AS churned
FROM cm c
LEFT JOIN nxt n ON n.o_custkey = c.o_custkey AND n.month = c.month
WHERE c.month < (SELECT MAX(month) FROM cm)""")
def label_churn_window(spark, sf_dir):
    """Churn-label generation — the supervised-learning labeling op:
    for every (customer, month) with activity, did the customer place
    NO order in the following month?  The scalable shape is
    dedupe-then-self-equi-join: orders collapse to distinct
    (customer, month) first (one hash-agg; the 100 TB fact becomes a
    customers×months frame), the "future" is that same frame shifted
    back one month and equi-joined — never a per-row interval probe
    or a correlated EXISTS.  The final month is excluded (its label
    window is unobserved — the right-censoring rule every churn
    dataset needs); the max-month scalar rides a 1-row broadcast."""
    o = load_table(spark, sf_dir, "orders")
    # cm feeds three consumers (labels, shifted future, max month):
    # persist so the fact scans + dedup-shuffles once, not thrice
    cm = (o.select("o_custkey",
                   F.trunc(F.col("o_orderdate").cast("date"), "month")
                   .alias("month"))
          .distinct().persist())
    nxt = cm.select("o_custkey", F.add_months("month", -1).alias("month"),
                    F.lit(1).alias("act"))
    mx = cm.agg(F.max("month").alias("__mx"))
    return (cm.join(nxt, ["o_custkey", "month"], "left")
            .join(F.broadcast(mx))
            .filter(F.col("month") < F.col("__mx"))
            .select("o_custkey", "month",
                    F.when(F.col("act").isNull(), 1).otherwise(0)
                    .cast("int").alias("churned")))


@q("assoc_copurchase_lift", """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ok AS (SELECT l_orderkey FROM li GROUP BY l_orderkey HAVING COUNT(*) <= 50),
b AS (SELECT li.l_orderkey, li.l_partkey FROM li JOIN ok USING (l_orderkey)),
n AS (SELECT COUNT(*) AS n_orders FROM ok),
ic AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY l_partkey),
pc AS (
  SELECT a.l_partkey AS p1, b2.l_partkey AS p2, COUNT(*) AS c_ab
  FROM b a
  JOIN b b2 ON b2.l_orderkey = a.l_orderkey
           AND a.l_partkey < b2.l_partkey
  GROUP BY 1, 2)
SELECT p1, p2, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(c_ab * n_orders AS DOUBLE)
         / CAST(i1.c * i2.c AS DOUBLE) AS lift
FROM pc, n
JOIN ic i1 ON i1.l_partkey = p1
JOIN ic i2 ON i2.l_partkey = p2
ORDER BY c_ab DESC, p1, p2
LIMIT 50""")
def assoc_copurchase_lift(spark, sf_dir):
    """Market-basket association: top co-purchased part pairs by
    support, with lift = P(ab)/(P(a)·P(b)).  The quadratic hazard is
    the within-basket pair join — bounded here the way production
    basket analysis bounds it: dedupe to (order, part), CAP the basket
    size (≤50; one hash-agg + semi-join — a single pathological
    999-item basket would otherwise emit half a million pairs), then
    the pair self-join is equi on orderkey with per-order work ≤ k²/2.
    Lift is computed as ONE IEEE-exact division of exact int64
    products (counts ≤ 10⁷ ⇒ products ≤ 10¹⁴, no overflow), so no
    rounding is needed for cross-engine equality; top-50 by
    (support DESC, p1, p2) compiles to TakeOrdered, never a global
    sort."""
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    ok = (li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__k"))
          .filter(F.col("__k") <= 50).select("l_orderkey"))
    # the capped basket frame is read four ways (order count, item
    # counts, both pair-join sides) — but all four consumers share the
    # identical (distinct → join) subtree inside ONE action, which
    # Catalyst collapses via ReusedExchange (4 in the executed plan,
    # A/B-measured faster than an explicit persist at sf0.1)
    b = li.join(ok, "l_orderkey")
    n = b.select("l_orderkey").distinct() \
         .agg(F.count(F.lit(1)).alias("__n"))
    ic = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("__c"))
    a2, b2 = b.alias("a"), b.alias("b2")
    pc = (a2.join(b2, (F.col("a.l_orderkey") == F.col("b2.l_orderkey"))
                  & (F.col("a.l_partkey") < F.col("b2.l_partkey")))
          .groupBy(F.col("a.l_partkey").alias("p1"),
                   F.col("b2.l_partkey").alias("p2"))
          .agg(F.count(F.lit(1)).alias("c_ab")))
    i1 = ic.select(F.col("l_partkey").alias("p1"), F.col("__c").alias("c1"))
    i2 = ic.select(F.col("l_partkey").alias("p2"), F.col("__c").alias("c2"))
    return (pc.join(i1, "p1").join(i2, "p2").join(F.broadcast(n))
            .select("p1", "p2", F.col("c_ab").cast("long").alias("c_ab"),
                    ((F.col("c_ab") * F.col("__n")).cast("double")
                     / (F.col("c1") * F.col("c2")).cast("double"))
                    .alias("lift"))
            .orderBy(F.desc("c_ab"), "p1", "p2").limit(50))


@q("ts_seasonal_strength", """
WITH c AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 168 AS how,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events),
g AS (SELECT event_type, how, COUNT(*) AS ng,
             CAST(SUM(v) AS BIGINT) AS sg
      FROM c GROUP BY 1, 2),
t AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS ss
      FROM c GROUP BY 1),
w AS (SELECT event_type,
             SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng) AS sw
      FROM g GROUP BY 1)
SELECT t.event_type AS event_type, CAST(n AS BIGINT) AS n,
  ROUND((ss - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n / 10000.0,
        4) + 0 AS var_total,
  ROUND((ss - sw) / n / 10000.0, 4) + 0 AS var_within,
  ROUND(1.0 - (ss - sw)
            / GREATEST(ss - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n,
                       0.000000000001), 4) + 0 AS strength
FROM t JOIN w ON w.event_type = t.event_type""")
def ts_seasonal_strength(spark, sf_dir):
    """Hour-of-week seasonal decomposition strength per event type —
    "how much of this series' variance is weekly seasonality?"
    (1 − var(residual)/var(total), the STL-style strength statistic,
    with the seasonal component the hour-of-week group mean).  Exact
    sufficient statistics all the way: values become int64 cents, the
    per-(type, hour) partials are exact integer (n, Σv) and the totals
    exact (n, Σv, Σv²) — so the heavy pass is TWO map-side-combined
    hash-aggs over exact ints (engine-order-independent, the class
    the r6 sf1 audit taught us to use), and floating point enters
    only in the final 168-term combine and divisions, masked by the
    canon-zero 4-decimal round.  Hour-of-week is pure epoch-µs
    integer division — no timezone/dayofweek calendar calls to
    diverge between engines."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.expr("pmod(unix_micros(cast(ts as timestamp)) div 3600000000, 168)")
        .alias("how"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"))
    g = (c.groupBy("event_type", "how")
         .agg(F.count(F.lit(1)).alias("ng"), F.sum("v").alias("sg")))
    t = (c.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
              F.sum(F.col("v") * F.col("v")).alias("ss")))
    w = (g.groupBy("event_type")
         .agg(F.sum(F.col("sg").cast("double") * F.col("sg").cast("double")
                    / F.col("ng")).alias("sw")))
    tot = (F.col("ss") - F.col("s").cast("double") * F.col("s").cast("double")
           / F.col("n"))
    return (t.join(w, "event_type")
            .select("event_type", F.col("n").cast("long").alias("n"),
                    (F.round(tot / F.col("n") / 10000.0, 4) + 0)
                    .alias("var_total"),
                    (F.round((F.col("ss") - F.col("sw")) / F.col("n")
                             / 10000.0, 4) + 0).alias("var_within"),
                    (F.round(1.0 - (F.col("ss") - F.col("sw"))
                             / F.greatest(tot, F.lit(1e-12)), 4) + 0)
                    .alias("strength")))


@q("feature_velocity_windows", """
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events)
SELECT user_id, event_id,
  CAST(COUNT(*) OVER w1 AS BIGINT) AS n_1h,
  CAST(SUM(v) OVER w1 AS BIGINT) AS cents_1h,
  CAST(COUNT(*) OVER w24 AS BIGINT) AS n_24h,
  CAST(SUM(v) OVER w24 AS BIGINT) AS cents_24h
FROM e
WINDOW
  w1 AS (PARTITION BY user_id ORDER BY us
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
  w24 AS (PARTITION BY user_id ORDER BY us
          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""")
def feature_velocity_windows(spark, sf_dir):
    """Point-in-time-correct velocity features — trailing 1 h / 24 h
    per-user event counts and amount sums AS OF each event (the
    feature-store primitive behind fraud velocity rules and any
    leakage-free training set: a feature may only see events ≤ its own
    timestamp).  Expressed as RANGE-frame windows over exact
    epoch-microsecond integers — the frame bound is data-defined, so
    Catalyst evaluates it per row with ONE sort per user partition and
    zero self-joins (the naive form is an events×events interval join).
    Both window frames share one partitioning+sort (a single Exchange,
    one Sort in the plan); amounts are int64 cents so the running sums
    are engine-order-independent.  Skew: a hot user serializes its
    partition — the running_sum_split hot-key treatment
    (operators/windows.py) applies unchanged if a user exceeds executor
    memory; at the events table's fan-out it is not needed."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"))
    w1 = (Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(-3_600_000_000, 0))
    w24 = (Window.partitionBy("user_id").orderBy("us")
           .rangeBetween(-86_400_000_000, 0))
    return e.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w1).cast("long").alias("n_1h"),
        F.sum("v").over(w1).cast("long").alias("cents_1h"),
        F.count(F.lit(1)).over(w24).cast("long").alias("n_24h"),
        F.sum("v").over(w24).cast("long").alias("cents_24h"))


@q("session_markov_transitions", """
WITH s AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts, event_id
  FROM events),
tr AS (
  SELECT event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id, day
                               ORDER BY ts, event_id) AS from_type
  FROM s),
c AS (
  SELECT from_type, to_type, COUNT(*) AS cnt
  FROM tr WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type),
tot AS (SELECT from_type, SUM(cnt) AS t FROM c GROUP BY from_type)
SELECT c.from_type AS from_type, c.to_type AS to_type,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE) AS p
FROM c JOIN tot ON tot.from_type = c.from_type""")
def session_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user behavior: within
    each (user, day) session, count consecutive event-type bigrams and
    normalize per source state — the behavioral-analytics /
    next-action-model primitive.  One keyed window (deterministic
    (ts, event_id) order) emits the lag pairs, then two hash-aggs; the
    per-source normalizer joins back on the tiny state set.
    Transition probability is ONE IEEE-exact division of exact counts
    — no rounding needed for cross-engine equality."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select("user_id", F.to_date("ts").alias("day"),
                  "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    tr = (s.select(F.col("event_type").alias("to_type"),
                   F.lag("event_type").over(w).alias("from_type"))
          .filter(F.col("from_type").isNotNull()))
    c = tr.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("cnt"))
    tot = c.groupBy("from_type").agg(F.sum("cnt").alias("t"))
    return (c.join(tot, "from_type")
            .select("from_type", "to_type",
                    F.col("cnt").cast("long").alias("cnt"),
                    (F.col("cnt").cast("double") / F.col("t").cast("double"))
                    .alias("p")))


@q("score_psi_drift", """
WITH e AS (
  SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
              THEN 'ref' ELSE 'cur' END AS pop,
         LEAST(CAST(FLOOR(value / 60.0) AS BIGINT), 9) AS bin
  FROM events),
c AS (SELECT pop, bin, COUNT(*) AS n FROM e GROUP BY pop, bin),
n AS (SELECT pop, SUM(n) AS tot FROM c GROUP BY pop),
bins AS (SELECT range AS bin FROM range(10)),
pq AS (
  SELECT b.bin,
    (COALESCE(r.n, 0) + 0.5)
      / ((SELECT tot FROM n WHERE pop = 'ref') + 5.0) AS p,
    (COALESCE(u.n, 0) + 0.5)
      / ((SELECT tot FROM n WHERE pop = 'cur') + 5.0) AS q
  FROM bins b
  LEFT JOIN c r ON r.bin = b.bin AND r.pop = 'ref'
  LEFT JOIN c u ON u.bin = b.bin AND u.pop = 'cur')
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       ROUND(SUM((p - q) * ln(p / q)), 6) + 0 AS psi
FROM pq""")
def score_psi_drift(spark, sf_dir):
    """Population Stability Index between the month's first- and
    second-half score distributions — the model-monitoring drift
    metric every deployed banking model is watched with
    (PSI = Σ (p−q)·ln(p/q) over score bins; > 0.2 conventionally
    triggers retraining).  Scale shape: ONE hash-agg over
    (population, bin) — the 100 TB scan reduces to 20 rows — then the
    10-bin spine (a literal range, so empty bins are present, with
    add-half smoothing keeping ln finite) assembles driver-light.
    Counts and totals are exact ints; ln enters only on 10 final
    terms, masked by the canon-zero 6-decimal round."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.when(F.to_date("ts") < F.lit("2024-01-16").cast("date"), "ref")
        .otherwise("cur").alias("pop"),
        F.least(F.floor(F.col("value") / 60.0).cast("long"), F.lit(9))
        .alias("bin"))
    # Collect the ≤20-row (pop, bin) agg ONCE — it feeds both the
    # totals scalar and the spine join, and a driver copy of a bounded
    # histogram is cheaper than persist()-and-forget (the r8 advice:
    # persisted intermediates leaked for the session's lifetime).  The
    # 100 TB scan still happens exactly once, distributed.
    c_rows = (e.groupBy("pop", "bin")
              .agg(F.count(F.lit(1)).alias("n")).collect())
    tots: dict[str, int] = {}
    for row in c_rows:
        tots[row["pop"]] = tots.get(row["pop"], 0) + row["n"]
    c = spark.createDataFrame(
        [(row["pop"], int(row["bin"]), int(row["n"])) for row in c_rows],
        "pop string, bin long, n long")
    bins = spark.range(10).select(F.col("id").alias("bin"))
    r = (c.filter(F.col("pop") == "ref")
         .select("bin", F.col("n").alias("rn")))
    u = (c.filter(F.col("pop") == "cur")
         .select("bin", F.col("n").alias("un")))
    pq = (bins.join(r, "bin", "left").join(u, "bin", "left")
          .select(
              ((F.coalesce(F.col("rn"), F.lit(0)) + 0.5)
               / F.lit(float(tots.get("ref", 0)) + 5.0)).alias("p"),
              ((F.coalesce(F.col("un"), F.lit(0)) + 0.5)
               / F.lit(float(tots.get("cur", 0)) + 5.0)).alias("q")))
    return pq.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        (F.round(F.sum((F.col("p") - F.col("q"))
                       * F.log(F.col("p") / F.col("q"))), 6) + 0)
        .alias("psi"))


@q("stream_heavy_hitters", """
WITH kk AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN user_id % 10
              ELSE event_id + 10000000 END AS key
  FROM events)
SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
FROM kk GROUP BY key ORDER BY cnt DESC, key LIMIT 10""")
def stream_heavy_hitters(spark, sf_dir):
    """Streaming top-10 heavy hitters — the real-time "who is hammering
    us right now" op: each micro-batch runs the distributed
    Misra–Gries candidate pass (functions/scale.py heavy_hitters_topk,
    so per-batch driver traffic is ≤ counters candidate rows, never
    the batch's key cardinality), the driver merges batch summaries
    with the MG trim (summary merge keeps the additive-error
    guarantee: any key with total count > N/counters survives to the
    end of the stream), and a final exact recount over the stored
    table verifies the candidates — the same sketch-then-verify shape
    as the batch entry, with the sketch half running incrementally.
    The planted fixture (a third of events collapse onto 10 hub keys,
    the rest near-unique) puts the hubs far above the guarantee
    threshold, so the streamed result equals the batch oracle's
    brute-force top-10 exactly."""
    import time as _time

    from aws_etl_bank_spark.functions.scale import heavy_hitters_topk
    from aws_etl_bank_spark.plans.registry_llm import _events_stream_dir
    from aws_etl_bank_spark.sources.testdata import events_stream
    from aws_etl_bank_spark.streaming import for_each_batch

    counters = 128

    def keyed(df):
        return df.select(
            F.when(F.col("event_id") % 3 == 0, F.col("user_id") % 10)
            .otherwise(F.col("event_id") + 10_000_000).alias("key"))

    state: dict = {}

    def handle(batch_df, batch_id):
        rows = heavy_hitters_topk(keyed(batch_df), "key",
                                  k=counters, counters=counters).collect()
        for r in rows:
            state[r.key] = state.get(r.key, 0) + r.cnt
        if len(state) > counters:
            cut = sorted(state.values(), reverse=True)[counters]
            for k2 in list(state):
                state[k2] -= cut
                if state[k2] <= 0:
                    del state[k2]

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    for_each_batch(stream, handle, {
        "windowSize": "1 seconds",
        "checkpointLocation": _scratch(
            sf_dir, f"hh_ckpt_{int(_time.time() * 1000)}"),
        "availableNow": True,
    })
    cand = spark.createDataFrame([(int(k),) for k in state], "key long")
    exact = (keyed(load_table(spark, sf_dir, "events"))
             .join(F.broadcast(cand), "key", "left_semi")
             .groupBy("key").agg(F.count(F.lit(1)).alias("cnt")))
    return (exact.orderBy(F.desc("cnt"), "key").limit(10)
            .select("key", F.col("cnt").cast("long").alias("cnt")))


@q("feature_decayed_velocity", """
WITH e AS (
  SELECT user_id, event_id, value,
         CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE)
           / 3600000000.0 AS t
  FROM events),
s AS (
  SELECT user_id, event_id, t,
         SUM(exp(t / 24.0)) OVER w AS s1,
         SUM(value * exp(t / 24.0)) OVER w AS s2
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, event_id,
       ROUND(exp(-t / 24.0) * s1, 4) + 0 AS decayed_n,
       ROUND(exp(-t / 24.0) * s2, 4) + 0 AS decayed_amt
FROM s""")
def feature_decayed_velocity(spark, sf_dir):
    """Exponentially time-decayed running features AS OF each event
    (24 h e-folding): decayed count Σe^{−λΔt} and decayed amount
    Σ value·e^{−λΔt} — the recency-weighted sibling of the hard-window
    velocity features, and the classic fraud/engagement feature a
    feature store serves.  The recursion s_i = x_i + e^{−λδ}·s_{i−1}
    is SERIAL as written; the scalable form factorizes it —
    e^{−λt_i} · Σ_{j≤i} x_j·e^{+λt_j} — turning it into TWO cumulative
    window sums over one keyed sort (the CUSUM trick: closed windows
    only, no applyInPandas, no serial scan).  Time is exact integer
    epoch-µs shifted to the data's base year before ONE IEEE division
    (keeps e^{+λt} ≤ e^{30} — factorization overflows if t is raw
    epoch), and both engines evaluate the prefix sums in the same
    deterministic (t, event_id) order, so the only cross-engine slack
    is exp()'s last ulp — masked by the canon-zero 4-decimal round."""
    ev = load_table(spark, sf_dir, "events")
    lam = 1.0 / 24.0
    t = ((F.expr("unix_micros(cast(ts as timestamp))")
          - F.lit(1704067200000000)).cast("double") / 3.6e9)
    e = ev.select("user_id", "event_id", "value", t.alias("t"))
    w = (Window.partitionBy("user_id").orderBy("t", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    s1 = F.sum(F.exp(F.col("t") * lam)).over(w)
    s2 = F.sum(F.col("value") * F.exp(F.col("t") * lam)).over(w)
    return e.select(
        "user_id", "event_id",
        (F.round(F.exp(-F.col("t") * lam) * s1, 4) + 0).alias("decayed_n"),
        (F.round(F.exp(-F.col("t") * lam) * s2, 4) + 0).alias("decayed_amt"))


@q("quality_entropy_profile", """
WITH lng AS (
  SELECT 'o_orderstatus' AS col, CAST(o_orderstatus AS VARCHAR) AS val
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
c AS (SELECT col, val, COUNT(*) AS n FROM lng GROUP BY col, val),
t AS (SELECT col, SUM(n) AS tot, COUNT(*) AS n_distinct FROM c GROUP BY col)
SELECT c.col AS col,
       CAST(t.n_distinct AS BIGINT) AS n_distinct,
       CAST(t.tot AS BIGINT) AS n_rows,
       ROUND(-SUM((CAST(n AS DOUBLE) / tot)
                  * ln(CAST(n AS DOUBLE) / tot)), 6) + 0 AS entropy
FROM c JOIN t ON t.col = c.col
GROUP BY c.col, t.n_distinct, t.tot""")
def quality_entropy_profile(spark, sf_dir):
    """Per-column Shannon entropy + distinct-count profile for
    categorical columns — the data-profiling statistic that flags both
    constant columns (entropy 0: a broken upstream writing one value)
    and exploding-cardinality columns (entropy ≈ log n — o_custkey is
    profiled as the planted example of an id leaking into a dimension)
    before they hit a model.  Scale shape: the wide
    table UNPIVOTS map-side to (col, val) — one fact scan for ALL
    profiled columns — then two hash-aggs (value counts map-side
    combine; per-column totals on the tiny count frame).  Counts and
    totals are exact ints; p·ln p runs only over the distinct-value
    frame, masked by the canon-zero 6-decimal round."""
    o = load_table(spark, sf_dir, "orders")
    lng = o.select(
        F.explode(F.map_from_arrays(
            F.array(F.lit("o_orderstatus"), F.lit("o_orderpriority"),
                    F.lit("o_custkey")),
            F.array(F.col("o_orderstatus").cast("string"),
                    F.col("o_orderpriority").cast("string"),
                    F.col("o_custkey").cast("string"))))
        .alias("col", "val"))
    c = lng.groupBy("col", "val").agg(F.count(F.lit(1)).alias("n"))
    t = (c.groupBy("col")
         .agg(F.sum("n").alias("tot"),
              F.count(F.lit(1)).alias("n_distinct")))
    p = F.col("n").cast("double") / F.col("tot")
    return (c.join(t, "col")
            .groupBy("col", "n_distinct", "tot")
            .agg((F.round(-F.sum(p * F.log(p)), 6) + 0).alias("entropy"))
            .select("col", F.col("n_distinct").cast("long").alias("n_distinct"),
                    F.col("tot").cast("long").alias("n_rows"), "entropy"))


@q("scale_bitmap_retention", """
WITH e AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(user_id // 62 AS BIGINT) AS word,
         1::BIGINT << CAST(user_id % 62 AS INT) AS mask
  FROM events),
bm AS (SELECT day, word, bit_or(mask) AS bits FROM e GROUP BY day, word),
dau AS (SELECT day, CAST(SUM(bit_count(bits)) AS BIGINT) AS dau
        FROM bm GROUP BY day),
ret AS (
  SELECT a.day AS day,
         CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS returned
  FROM bm a JOIN bm b ON b.word = a.word AND b.day = a.day + 1
  GROUP BY a.day)
SELECT d.day AS day, d.dau,
       COALESCE(r.returned, 0) AS returned_next_day
FROM dau d LEFT JOIN ret r ON r.day = d.day""")
def scale_bitmap_retention(spark, sf_dir):
    """Bitmap-index distinct rollup — the Druid/ClickHouse groupBitmap
    pattern in pure DataFrame algebra: user presence per day compresses
    to 62-bit words via bit_or (one map-side-combined hash-agg; the
    per-day state is ≤ max_user/62 words, NOT a user set), DAU is a
    bit_count sum over the bitmap, and next-day retention is a bitmap
    AND — an equi-join on (word, day+1) followed by popcount, with NO
    count-distinct shuffle anywhere.  This is the shape that replaces
    COUNT(DISTINCT) entirely for dense integer ids at 100 TB: bitmaps
    merge associatively (incremental days just OR in), intersect
    cheaply (any cohort overlap is AND+popcount), and the whole state
    is int64 columns any engine can store.  62 bits per word, not 64:
    a shift into the sign bit is int64 overflow on engines that check
    (DuckDB raises).  The tiny bitmap frame persists — its three
    consumers (DAU, both retention sides) would otherwise rescan the
    fact."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.to_date("ts").alias("day"),
        F.expr("user_id div 62").alias("word"),
        F.expr("shiftleft(1L, cast(pmod(user_id, 62) as int))").alias("mask"))
    bm = (e.groupBy("day", "word")
          .agg(F.expr("bit_or(mask)").alias("bits")).persist())
    dau = (bm.groupBy("day")
           .agg(F.sum(F.bit_count("bits")).cast("long").alias("dau")))
    a, b = bm.alias("a"), bm.alias("b")
    ret = (a.join(b, (F.col("b.word") == F.col("a.word"))
                  & (F.col("b.day") == F.date_add(F.col("a.day"), 1)))
           .groupBy(F.col("a.day").alias("day"))
           .agg(F.sum(F.bit_count(
               F.col("a.bits").bitwiseAND(F.col("b.bits"))))
               .cast("long").alias("returned")))
    return (dau.join(ret, "day", "left")
            .select("day", "dau",
                    F.coalesce(F.col("returned"), F.lit(0)).cast("long")
                    .alias("returned_next_day")))


@q("session_top_paths", """
WITH s AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts, event_id
           FROM events),
p AS (SELECT user_id, day,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, day),
c AS (SELECT path, COUNT(*) AS n FROM p GROUP BY path)
SELECT path, CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, path LIMIT 20""")
def session_top_paths(spark, sf_dir):
    """Top-20 user journey paths — each (user, day) session's ordered
    event-type sequence as a '>'-joined path string, counted and
    ranked (the clickstream "common paths" report; the full-sequence
    sibling of session_markov_transitions' bigrams).  Scale shape: ONE
    hash-agg builds every session's path via collect_list +
    array_sort(struct(ts, event_id, type)) — sorting happens inside
    the aggregation buffer per session (bounded by session length),
    not as a corpus-wide sort — then a path-keyed count and a
    TakeOrdered finish.  Deterministic: the struct sort pins
    (ts, event_id) order identically to the oracle's ordered
    string_agg."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select("user_id", F.to_date("ts").alias("day"),
                  "event_type", "ts", "event_id")
    p = (s.groupBy("user_id", "day")
         .agg(F.array_join(
             F.transform(
                 F.array_sort(F.collect_list(
                     F.struct("ts", "event_id", "event_type"))),
                 lambda x: x["event_type"]),
             ">").alias("path")))
    return (p.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "path").limit(20)
            .select("path", F.col("n").cast("long").alias("n")))


@q("scd_snapshot_diff", """
WITH oldt AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0),
newt AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.5
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 89 <> 0),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_totalprice AS op, o.o_orderstatus AS os,
         n.o_totalprice AS np, n.o_orderstatus AS ns,
         o.o_orderkey IS NOT NULL AS ino,
         n.o_orderkey IS NOT NULL AS inn
  FROM oldt o FULL OUTER JOIN newt n ON n.o_orderkey = o.o_orderkey)
SELECT o_orderkey,
       CASE WHEN NOT ino THEN 'I' WHEN NOT inn THEN 'D'
            ELSE 'U' END AS change_type,
       CASE WHEN ino AND inn THEN array_to_string(list_sort(list_filter(
              [CASE WHEN op IS DISTINCT FROM np
                    THEN 'o_totalprice' END,
               CASE WHEN os IS DISTINCT FROM ns
                    THEN 'o_orderstatus' END],
              x -> x IS NOT NULL)), ',')
            ELSE '' END AS changed_cols,
       np AS o_totalprice, ns AS o_orderstatus
FROM j
WHERE NOT (ino AND inn AND op IS NOT DISTINCT FROM np
           AND os IS NOT DISTINCT FROM ns)""")
def scd_snapshot_diff(spark, sf_dir):
    """Changeset generation between two daily extracts
    (aws_etl_bank_spark/scd.py:snapshot_diff) — the CDC-feed-from-
    full-extract pattern: yesterday's snapshot (keys %97 removed
    simulate not-yet-inserted rows) diffed against today's (keys %89
    dropped = deletes, %13 repriced = updates) in ONE null-safe
    full-outer join; I/D fall out of join-side nullness, U out of a
    null-safe column compare, per-column change flags are array
    expressions on the same row.  The +1.5 reprice is an IEEE-exact
    double op, so both engines see identical update values.  The
    changed-column list is sorted and serialized with ``array_join``
    (house convention — the driver's pandas canon cannot hash raw
    arrays; same as agg_payment_types)."""
    from aws_etl_bank_spark.scd import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderkey") % 97 != 0)
           .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    new = (o.filter(F.col("o_orderkey") % 89 != 0)
           .select("o_orderkey",
                   F.when(F.col("o_orderkey") % 13 == 0,
                          F.col("o_totalprice") + 1.5)
                   .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
                   "o_orderstatus"))
    d = snapshot_diff(old, new, ["o_orderkey"],
                      ["o_totalprice", "o_orderstatus"])
    return d.withColumn("changed_cols",
                        F.array_join(F.array_sort("changed_cols"), ","))


@q("ts_lateness_profile", """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
l AS (
  SELECT user_id,
         GREATEST(0, COALESCE(
             max(us) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) - us, 0)) AS late_us
  FROM e)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
       CAST(MAX(late_us) AS BIGINT) AS max_late_us
FROM l GROUP BY user_id""")
def ts_lateness_profile(spark, sf_dir):
    """Event-time lateness profile — the diagnostic that SIZES
    WATERMARKS: per key, how many events arrived behind an
    already-seen later timestamp (arrival order = the monotonic
    ingest id) and by at most how much.  The streaming suite's
    `withWatermark` thresholds are exactly this table's max/quantiles;
    running it on the batch mirror of the stream is how the threshold
    is chosen rather than guessed.  Shape: one KEYED running-max
    window (the global-watermark variant would be a single-partition
    ORDER BY event_id window — the anti-pattern; compute per key and
    aggregate the per-key maxima instead) + one hash-agg; lateness is
    exact epoch-µs integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id",
                  F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    late = F.greatest(
        F.lit(0), F.coalesce(F.max("us").over(w) - F.col("us"), F.lit(0)))
    return (e.withColumn("late_us", late)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
                 .cast("long").alias("n_late"),
                 F.max("late_us").cast("long").alias("max_late_us")))


@q("ts_rollup_cascade", """
WITH c AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events)
SELECT event_type,
       CAST(day // 30 AS BIGINT) AS period,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_cents,
       CAST(MIN(v) AS BIGINT) AS min_cents,
       CAST(MAX(v) AS BIGINT) AS max_cents
FROM c GROUP BY event_type, day // 30""")
def ts_rollup_cascade(spark, sf_dir):
    """Rollup CASCADE: the 30-day-period rollup computed FROM the
    daily rollup — never re-touching raw events — checked against an
    oracle that aggregates the raw data directly.  This is the
    continuous-aggregate maintenance contract at 100 TB: day → week →
    month each re-aggregates the previous (decomposable) level, so
    coarser grains cost |days| rows, not |events|; the oracle equality
    IS the proof that (count, sum, min, max) compose losslessly
    through the cascade (avg deliberately re-derives from sum/count —
    averaging averages is the classic cascade bug, kept out by
    construction).  Two map-side-combined hash-aggs; exact int cents
    and epoch-µs day buckets throughout."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"))
    daily = (c.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                  F.min("v").alias("mn"), F.max("v").alias("mx")))
    return (daily.groupBy("event_type",
                          F.expr("day div 30").cast("long").alias("period"))
            .agg(F.sum("n").cast("long").alias("n"),
                 F.sum("s").cast("long").alias("sum_cents"),
                 F.min("mn").cast("long").alias("min_cents"),
                 F.max("mx").cast("long").alias("max_cents")))


@q("feature_impute_group", """
WITH e AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 = 0 THEN NULL
              ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS v
  FROM events),
p AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e WHERE v IS NOT NULL),
medx AS (
  SELECT p.event_type,
         (CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS DOUBLE)
          + MAX(CASE WHEN rn = (n + 2) // 2 THEN v END)) / 2.0 AS med
  FROM p GROUP BY p.event_type)
SELECT e.event_id, e.event_type,
       COALESCE(CAST(e.v AS DOUBLE), medx.med) AS v_imputed,
       CAST(CASE WHEN e.v IS NULL THEN 1 ELSE 0 END AS INTEGER)
           AS was_imputed
FROM e JOIN medx ON medx.event_type = e.event_type""")
def feature_impute_group(spark, sf_dir):
    """Group-median NULL imputation — the ML-preprocessing step with
    the grouped-median trap: engine `median()` interpolation rules
    differ, so the median is rank-picked exactly
    ((⌊(n+1)/2⌋-th + ⌈(n+1)/2⌉-th)/2 over int cents — the
    ts_anomaly_mad recipe), making imputed values engine-identical by
    arithmetic, not by luck.  NULLs are planted deterministically
    (event_id % 7) so the imputation path is oracle-covered for every
    group.  Shape: one rank window per group over NON-NULL rows only
    + a group-sized broadcast join-back; the imputed flag rides along
    for downstream leakage audits."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .alias("v"))
    nn = e.filter(F.col("v").isNotNull())
    w = Window.partitionBy("event_type").orderBy("v")
    p = (nn.withColumn("rn", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(
             Window.partitionBy("event_type"))))
    med = (p.groupBy("event_type")
           .agg(((F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                               F.col("v")).otherwise(None)
                        .cast("double"))
                  + F.max(F.when(F.col("rn") == F.expr("(n + 2) div 2"),
                                 F.col("v")).otherwise(None)))
                 / 2.0).alias("med")))
    return (e.join(F.broadcast(med), "event_type")
            .select("event_id", "event_type",
                    F.coalesce(F.col("v").cast("double"), F.col("med"))
                    .alias("v_imputed"),
                    F.when(F.col("v").isNull(), 1).otherwise(0)
                    .cast("int").alias("was_imputed")))


@q("feature_target_encode_loo", """
WITH e AS (
  SELECT o_orderkey, o_orderpriority AS cat,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y
  FROM orders),
g AS (SELECT cat, SUM(y) AS s, COUNT(*) AS n FROM e GROUP BY cat)
SELECT o_orderkey, cat,
       CASE WHEN n > 1 THEN CAST(s - y AS DOUBLE) / (n - 1) END AS te_loo
FROM e JOIN g USING (cat)""")
def feature_target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding — the high-cardinality-categorical
    feature with the leakage correction done in closed form: each
    row's encoding is (Σ_group y − y_own)/(n_group − 1), so a row
    never sees its own target (the naive group-mean join leaks and
    overfits; the naive per-row recompute is O(N·groups)).  ONE
    hash-agg to group sufficient stats + a group-sized broadcast
    join-back; the encoding is exact int cents and one IEEE division,
    engine-identical without rounding.  Singleton groups yield NULL
    (no peer signal) rather than a leaked self-mean."""
    o = load_table(spark, sf_dir, "orders")
    e = o.select("o_orderkey", F.col("o_orderpriority").alias("cat"),
                 F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                 .alias("y"))
    g = e.groupBy("cat").agg(F.sum("y").alias("s"),
                             F.count(F.lit(1)).alias("n"))
    return (e.join(F.broadcast(g), "cat")
            .select("o_orderkey", "cat",
                    F.when(F.col("n") > 1,
                           (F.col("s") - F.col("y")).cast("double")
                           / (F.col("n") - 1)).alias("te_loo")))


@q("sample_class_balanced", """
WITH e AS (
  SELECT event_id, event_type,
         (((event_id % 1000003 + 1000003) % 1000003) * 2654435761)
           % 1000003 AS hk
  FROM events),
cc AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY event_type),
nm AS (SELECT MIN(n) AS n_min FROM cc),
r AS (SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY hk, event_id) AS rn
      FROM e)
SELECT r.event_id, r.event_type
FROM r, nm WHERE r.rn <= nm.n_min""")
def sample_class_balanced(spark, sf_dir):
    """Deterministic class-balanced downsample — every label keeps
    exactly n_min rows (the minority-class count), selected by the
    corpus-stable Knuth hash so membership is a pure function of the
    id (reproducible across reruns/partitionings/engines; rand()-based
    balancing is not).  The per-class rank filter rides the
    WindowGroupLimit pattern of sample_per_group_bottomk — except the
    limit is data-dependent (n_min via a 1-row broadcast), so the
    filter applies post-window; the window is still keyed per class,
    never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    hk = F.pmod(F.pmod(F.col("event_id").cast("long"), F.lit(1000003))
                * F.lit(2654435761 % 1000003), F.lit(1000003))
    e = ev.select("event_id", "event_type", hk.alias("__hk"))
    nm = (e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
          .agg(F.min("n").alias("__n_min")))
    w = Window.partitionBy("event_type").orderBy("__hk", "event_id")
    return (e.withColumn("__rn", F.row_number().over(w))
            .join(F.broadcast(nm))
            .filter(F.col("__rn") <= F.col("__n_min"))
            .select("event_id", "event_type"))


@q("split_temporal_purged", """
WITH e AS (
  SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-18' THEN 'train'
              WHEN CAST(ts AS DATE) >= DATE '2024-01-20' THEN 'test'
              ELSE 'purged' END AS split,
         epoch_us(ts) AS us
  FROM events)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(us) AS BIGINT) AS min_us,
       CAST(MAX(us) AS BIGINT) AS max_us
FROM e GROUP BY split""")
def split_temporal_purged(spark, sf_dir):
    """Purged temporal train/test split — the financial-ML split
    discipline (de Prado's purging): a 2-day embargo BETWEEN train and
    test is dropped so that features with trailing windows (the
    velocity/decay entries) cannot straddle the boundary and leak
    test-period information into training rows.  Map-only labeling;
    the oracle pins each split's row count and exact epoch-µs
    boundaries, which is the property that matters (no event on the
    wrong side).  The summary shape keeps the entry compact; the
    per-row labeling is the same CASE expression."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    split = (F.when(day < F.lit("2024-01-18").cast("date"), "train")
             .when(day >= F.lit("2024-01-20").cast("date"), "test")
             .otherwise("purged"))
    return (ev.select(split.alias("split"),
                      F.expr("unix_micros(cast(ts as timestamp))")
                      .alias("us"))
            .groupBy("split")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min("us").cast("long").alias("min_us"),
                 F.max("us").cast("long").alias("max_us")))


@q("ml_ols_closed_form", """
WITH f AS (
  SELECT CAST(epoch_us(ts) // 86400000000 - 19723 AS BIGINT) AS x1,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS x2,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
  FROM events),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y
  FROM f),
d AS (
  SELECT n, s1, s2, sy, s11, s12, s22, s1y, s2y,
    CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22
                         - CAST(s12 AS DOUBLE) * s12)
    - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22
                            - CAST(s12 AS DOUBLE) * s2)
    + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12
                            - CAST(s11 AS DOUBLE) * s2) AS det
  FROM s)
SELECT CAST(n AS BIGINT) AS n,
  ROUND((CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22
                               - CAST(s12 AS DOUBLE) * s12)
         - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22
                                 - CAST(s12 AS DOUBLE) * s2y)
         + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12
                                 - CAST(s11 AS DOUBLE) * s2y))
        / det, 6) + 0 AS beta0,
  ROUND((CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22
                              - CAST(s12 AS DOUBLE) * s2y)
         - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22
                                 - CAST(s12 AS DOUBLE) * s2)
         + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y
                                 - CAST(s1y AS DOUBLE) * s2))
        / det, 6) + 0 AS beta1,
  ROUND((CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y
                              - CAST(s1y AS DOUBLE) * s12)
         - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y
                                 - CAST(s1y AS DOUBLE) * s2)
         + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12
                                 - CAST(s11 AS DOUBLE) * s2))
        / det, 6) + 0 AS beta2
FROM d""")
def ml_ols_closed_form(spark, sf_dir):
    """Distributed ordinary least squares in closed form — cents ~
    day-index + hour-of-day: the 100 TB regression shape is ONE
    map-side-combined aggregation to the 9 exact-int64 sufficient
    statistics (n, Σx, Σxxᵀ, Σxy — feature magnitudes bound every sum
    far below 2⁶³), then the 3×3 normal equations solve by CRAMER'S
    RULE as a row-local expression — no driver linear algebra, no
    iterations, no collect beyond the single stats row.  Cross-engine
    exactness: the determinant expressions are WRITTEN IDENTICALLY on
    both sides over identical exact ints, so the doubles agree to the
    last ulp before the canon-zero 6-decimal round.  (The d×d general
    case is embed_pca_planted_axis's Gram machinery + a driver solve;
    Cramer is the no-driver special case every fixed-small-d
    regression should use.)"""
    ev = load_table(spark, sf_dir, "events")
    f = ev.select(
        (F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
         - 19723).alias("x1"),
        F.expr("pmod(unix_micros(cast(ts as timestamp)) div 3600000000, 24)")
        .alias("x2"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y"))
    s = f.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"))
    c = {k: F.col(k).cast("double") for k in
         ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")}
    det = (c["n"] * (c["s11"] * c["s22"] - c["s12"] * c["s12"])
           - c["s1"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
           + c["s2"] * (c["s1"] * c["s12"] - c["s11"] * c["s2"]))
    b0 = (c["sy"] * (c["s11"] * c["s22"] - c["s12"] * c["s12"])
          - c["s1"] * (c["s1y"] * c["s22"] - c["s12"] * c["s2y"])
          + c["s2"] * (c["s1y"] * c["s12"] - c["s11"] * c["s2y"]))
    b1 = (c["n"] * (c["s1y"] * c["s22"] - c["s12"] * c["s2y"])
          - c["sy"] * (c["s1"] * c["s22"] - c["s12"] * c["s2"])
          + c["s2"] * (c["s1"] * c["s2y"] - c["s1y"] * c["s2"]))
    b2 = (c["n"] * (c["s11"] * c["s2y"] - c["s1y"] * c["s12"])
          - c["s1"] * (c["s1"] * c["s2y"] - c["s1y"] * c["s2"])
          + c["sy"] * (c["s1"] * c["s12"] - c["s11"] * c["s2"]))
    return s.select(
        F.col("n").cast("long").alias("n"),
        (F.round(b0 / det, 6) + 0).alias("beta0"),
        (F.round(b1 / det, 6) + 0).alias("beta1"),
        (F.round(b2 / det, 6) + 0).alias("beta2"))


@q("stream_batch_unified", """
SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY day""")
def stream_batch_unified(spark, sf_dir):
    """Kappa-style stream/batch unification: history is a batch read
    (days before the cutover), the live path REPLAYS the stream from
    one day BEFORE the cutover (the deliberate overlap every
    at-least-once handoff has) through a real foreachBatch parquet
    sink, and the unified view dedups the overlap by event id
    (first-arrival) before aggregating.  The oracle is the plain
    batch aggregate over the WHOLE table — equality proves the
    handoff loses nothing and double-counts nothing, the two failure
    modes of a batch→stream cutover.  The live path stays distributed
    end-to-end (micro-batches append to files; nothing corpus-sized
    crosses the driver)."""
    import time as _time

    from aws_etl_bank_spark.plans.registry_llm import _events_stream_dir
    from aws_etl_bank_spark.sources.testdata import events_stream
    from aws_etl_bank_spark.streaming import for_each_batch

    cut = F.lit("2024-01-16").cast("date")
    ev = load_table(spark, sf_dir, "events")
    hist = (ev.filter(F.to_date("ts") < cut)
            .select("event_id", F.to_date("ts").alias("day")))
    sink = _scratch(sf_dir, f"kappa_sink_{int(_time.time() * 1000)}")

    def handle(batch_df, batch_id):
        (batch_df.filter(F.to_date("ts") >= F.date_sub(cut, 1))
         .select("event_id", F.to_date("ts").alias("day"))
         .write.mode("append").parquet(sink))

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    for_each_batch(stream, handle, {
        "windowSize": "1 seconds",
        "checkpointLocation": _scratch(
            sf_dir, f"kappa_ckpt_{int(_time.time() * 1000)}"),
        "availableNow": True,
    })
    live = spark.read.parquet(sink)
    return (hist.unionByName(live)
            .dropDuplicates(["event_id"])
            .groupBy("day")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


@q("agg_mode_per_group", """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1""")
def agg_mode_per_group(spark, sf_dir):
    """Exact per-group mode with a DETERMINISTIC tie-break — each
    user's most frequent event type, ties to the lexicographically
    first (engine `mode()` tie behavior is undefined, which is why it
    never appears here).  Two-level shape: value counts first (one
    map-side-combined hash-agg — the (group, value) frame is the
    small one), then max_by over the counted rows; the rank filter
    rides WindowGroupLimit so only one row per group survives the
    second exchange."""
    ev = load_table(spark, sf_dir, "events")
    c = (ev.groupBy("user_id", "event_type")
         .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (c.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", F.col("event_type").alias("mode_type"),
                    F.col("n").cast("long").alias("n")))


@q("join_interval_overlap", """
WITH s AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MIN(epoch_us(ts)) AS lo,
         MIN(epoch_us(ts)) + 300000000 AS hi
  FROM events GROUP BY user_id, CAST(ts AS DATE)),
p AS (
  SELECT a.day AS day, a.user_id AS u1, b.user_id AS u2
  FROM s a JOIN s b
    ON b.day = a.day AND a.user_id < b.user_id
   AND a.lo <= b.hi AND b.lo <= a.hi)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs
FROM p GROUP BY day""")
def join_interval_overlap(spark, sf_dir):
    """INTERVAL × INTERVAL overlap join — which users' 5-minute
    session-start windows were concurrently active each day — the
    two-sided generalization of
    the point-probe range join (operators/joins.py range_join): both
    sides are intervals, so neither can be bucketized away
    one-sidedly.  Scale shape: each day-session explodes to the HOUR
    BUCKETS it covers (bounded ≤ 24× — the banding trick), candidate
    pairs come from an equi-join on (day, bucket), duplicates from
    multi-bucket overlaps collapse with a distinct, and the exact
    lo ≤ hi' ∧ lo' ≤ hi predicate verifies candidates — never a
    non-equi nested-loop over sessions² (no BNLJ, plan-asserted in
    tests).  The oracle does the naive quadratic interval join —
    checking the banded plan against the definition.  The 5-minute
    fixture keeps the TRUE overlap density sparse at every SF (a
    whole-day-interval fixture degenerates to all-pairs — output
    quadratic in users, which no join strategy can save; interval
    joins are only meaningful when overlap is selective)."""
    ev = load_table(spark, sf_dir, "events")
    s = (ev.select("user_id", F.to_date("ts").alias("day"),
                   F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
         .groupBy("user_id", "day")
         .agg(F.min("us").alias("lo"),
              (F.min("us") + 300_000_000).alias("hi")))
    hour = 3_600_000_000
    b = s.select(
        "user_id", "day", "lo", "hi",
        F.explode(F.sequence(F.expr(f"lo div {hour}"),
                             F.expr(f"hi div {hour}"))).alias("bucket"))
    a2, b2 = b.alias("a"), b.alias("b")
    cand = (a2.join(b2, (F.col("b.day") == F.col("a.day"))
                    & (F.col("b.bucket") == F.col("a.bucket"))
                    & (F.col("a.user_id") < F.col("b.user_id")))
            .filter((F.col("a.lo") <= F.col("b.hi"))
                    & (F.col("b.lo") <= F.col("a.hi")))
            .select(F.col("a.day").alias("day"),
                    F.col("a.user_id").alias("u1"),
                    F.col("b.user_id").alias("u2"))
            .distinct())
    return (cand.groupBy("day")
            .agg(F.count(F.lit(1)).cast("long")
                 .alias("n_overlapping_pairs")))


@q("agg_weighted_median", """
WITH e AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(1 + user_id % 5 AS BIGINT) AS w
  FROM events),
r AS (
  SELECT event_type, v, w,
         SUM(w) OVER (PARTITION BY event_type ORDER BY v, w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM e)
SELECT event_type,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
           AS weighted_median_cents,
       CAST(MAX(tw) AS BIGINT) AS total_weight
FROM r GROUP BY event_type""")
def agg_weighted_median(spark, sf_dir):
    """Exact weighted median per group — the lower weighted median
    (smallest v whose cumulative weight reaches half the total), the
    definition that needs NO interpolation and therefore no
    engine-specific percentile semantics: one keyed sort window for
    the running weight, one whole-group window for the total (both
    share the partition exchange), and a conditional-min aggregate
    picks the answer.  All arithmetic exact int64 (cents, integer
    weights, 2·cw ≥ tw instead of cw ≥ tw/2 — no division at all).
    Deterministic under ties via the (v, w) sort; weights here derive
    from user_id so the fixture is reproducible."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
        (1 + F.col("user_id") % 5).cast("long").alias("w"))
    wcum = (Window.partitionBy("event_type").orderBy("v", "w")
            .rowsBetween(Window.unboundedPreceding, 0))
    wtot = Window.partitionBy("event_type")
    r = (e.withColumn("cw", F.sum("w").over(wcum))
         .withColumn("tw", F.sum("w").over(wtot)))
    return (r.groupBy("event_type")
            .agg(F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v")))
                 .cast("long").alias("weighted_median_cents"),
                 F.max("tw").cast("long").alias("total_weight")))


@q("ts_autocorrelation", """
WITH h AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000),
p AS (
  SELECT event_type, s AS x,
         lead(s) OVER (PARTITION BY event_type ORDER BY hr) AS y
  FROM h),
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM p WHERE y IS NOT NULL GROUP BY event_type)
SELECT event_type, n,
  ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
        6) + 0 AS acf_lag1
FROM st""")
def ts_autocorrelation(spark, sf_dir):
    """Lag-1 autocorrelation of each event type's hourly totals — the
    first statistic of any forecasting/seasonality screen ("is this
    series even autocorrelated?"), computed the cross-engine-exact
    way: hourly cent sums are exact int64, the lag pairs come from one
    keyed window, and the Pearson correlation is assembled from exact
    integer sufficient statistics (N·Σxy − ΣxΣy form — the same
    no-streaming-variance rule as ts_seasonal_strength), with floats
    only in the final per-group expression (IEEE mult/sub/div/sqrt —
    no libm), canon-zero rounded.  Two map-side-combined hash-aggs +
    one keyed sort shared by the lag window."""
    ev = load_table(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
                   .alias("hr"),
                   F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"))
         .groupBy("event_type", "hr").agg(F.sum("v").alias("s")))
    w = Window.partitionBy("event_type").orderBy("hr")
    p = (h.select("event_type", F.col("s").alias("x"),
                  F.lead("s").over(w).alias("y"))
         .filter(F.col("y").isNotNull()))
    st = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    c = {k: F.col(k).cast("double")
         for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    acf = ((c["n"] * c["sxy"] - c["sx"] * c["sy"])
           / F.sqrt((c["n"] * c["sxx"] - c["sx"] * c["sx"])
                    * (c["n"] * c["syy"] - c["sy"] * c["sy"])))
    return st.select("event_type", F.col("n").cast("long").alias("n"),
                     (F.round(acf, 6) + 0).alias("acf_lag1"))


@q("stream_ohlc_incremental", """
WITH r AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS bucket, value,
         row_number() OVER (PARTITION BY event_type,
                                         epoch_us(ts) // 86400000000
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       ROUND(min_by(value, rn), 2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(max_by(value, rn), 2) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r GROUP BY event_type, bucket""")
def stream_ohlc_incremental(spark, sf_dir):
    """Streaming OHLC candles — ts_ohlc_bucket's mergeable form:
    open/close look order-dependent (the disqualifier for naive
    incremental aggregation), but each micro-batch's partial
    (argmin/argmax of value OVER THE EVENT-TIME KEY (ts, event_id),
    plus min/max/count) IS decomposable: cross-batch merge is the
    same min_by/max_by over the partials' keys, so candles stream
    with per-(type, bucket) state of five scalars — no raw-row state,
    no arrival-order dependence (proof: events arrive in file order,
    not time order, and the result still hash-matches the BATCH
    oracle, shared verbatim with ts_ohlc_bucket)."""
    import time as _time

    import pyspark.sql.types as T

    from aws_etl_bank_spark.plans.registry_llm import _events_stream_dir
    from aws_etl_bank_spark.sources.testdata import events_stream
    from aws_etl_bank_spark.streaming import for_each_batch

    def partials(df):
        bucket = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        key = F.struct(F.col("ts"), F.col("event_id"))
        return (df.withColumn("bucket", bucket)
                .groupBy("event_type", "bucket")
                .agg(F.expr("min_by(struct(ts, event_id, value), "
                            "struct(ts, event_id))").alias("o"),
                     F.max("value").alias("high"),
                     F.min("value").alias("low"),
                     F.expr("max_by(struct(ts, event_id, value), "
                            "struct(ts, event_id))").alias("c"),
                     F.count(F.lit(1)).alias("n")))

    collected: list = []

    def handle(batch_df, batch_id):
        collected.extend(partials(batch_df).collect())

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    for_each_batch(stream, handle, {
        "windowSize": "1 seconds",
        "checkpointLocation": _scratch(
            sf_dir, f"ohlc_ckpt_{int(_time.time() * 1000)}"),
        "availableNow": True,
    })
    key_t = T.StructType([T.StructField("ts", T.TimestampType()),
                          T.StructField("event_id", T.LongType()),
                          T.StructField("value", T.DoubleType())])
    schema = T.StructType([
        T.StructField("event_type", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("o", key_t), T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()), T.StructField("c", key_t),
        T.StructField("n", T.LongType())])
    parts = spark.createDataFrame(collected, schema)
    merged = (parts.groupBy("event_type", "bucket")
              .agg(F.expr("min_by(o, struct(o.ts, o.event_id))").alias("o"),
                   F.max("high").alias("high"), F.min("low").alias("low"),
                   F.expr("max_by(c, struct(c.ts, c.event_id))").alias("c"),
                   F.sum("n").alias("n")))
    return merged.select(
        "event_type", F.col("bucket").cast("long").alias("bucket"),
        F.round(F.col("o.value"), 2).alias("open"),
        F.round("high", 2).alias("high"), F.round("low", 2).alias("low"),
        F.round(F.col("c.value"), 2).alias("close"),
        F.col("n").cast("long").alias("n"))


@q("csv_malformed_policy", """
SELECT
  CAST((SELECT COUNT(*) FROM customer WHERE c_custkey <= 1000)
       AS BIGINT) AS n_permissive,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey <= 1000 AND c_custkey % 10 = 0)
       AS BIGINT) AS n_corrupt,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey <= 1000 AND c_custkey % 10 <> 0)
       AS BIGINT) AS n_dropmalformed,
  CAST((SELECT SUM(c_custkey * 2) FROM customer
        WHERE c_custkey <= 1000 AND c_custkey % 10 <> 0)
       AS BIGINT) AS sum_amount_good""")
def csv_malformed_policy(spark, sf_dir):
    """CSV malformed-record policies end-to-end (the mode= /
    columnNameOfCorruptRecord contract of the CSV source): a landing
    file is written DISTRIBUTED (lines via write.text — no driver
    loop) with every 10th record's numeric field corrupted, then read
    back under an enforced schema in PERMISSIVE mode (row count
    preserved, corrupt originals captured in the rescue column — the
    audit-trail the banking raw zone wants) and DROPMALFORMED mode
    (bad rows vanish).  The oracle derives all four counts and the
    good-row checksum from the source table — a policy regression
    (silent row loss in PERMISSIVE, leakage in DROPMALFORMED, a
    miscounted rescue column) moves a number."""
    import time as _time

    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 1000))
    lines = cust.select(F.when(
        F.col("c_custkey") % 10 == 0,
        F.concat_ws(",", F.col("c_custkey").cast("string"),
                    F.lit("not-a-number")))
        .otherwise(F.concat_ws(",", F.col("c_custkey").cast("string"),
                               (F.col("c_custkey") * 2).cast("string")))
        .alias("value"))
    path = _scratch(sf_dir, f"csv_malformed_{int(_time.time() * 1000)}")
    lines.write.mode("overwrite").text(path)
    schema = "id long, amount long, _corrupt string"
    # Spark forbids referencing the rescue column on the raw CSV
    # relation (it would need a second parse with different semantics);
    # the documented contract is to cache the parsed rows first
    perm = (spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .csv(path).cache())
    perm_agg = perm.agg(
        F.count(F.lit(1)).alias("n_permissive"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .alias("n_corrupt"))
    drop = (spark.read.schema("id long, amount long")
            .option("mode", "DROPMALFORMED").csv(path))
    drop_agg = drop.agg(F.count(F.lit(1)).alias("n_dropmalformed"),
                        F.sum("amount").alias("sum_amount_good"))
    return (perm_agg.crossJoin(drop_agg)
            .select(F.col("n_permissive").cast("long"),
                    F.col("n_corrupt").cast("long"),
                    F.col("n_dropmalformed").cast("long"),
                    F.col("sum_amount_good").cast("long")))


@q("funnel_time_to_convert", """
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY user_id),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_us
  GROUP BY e.user_id),
d AS (
  SELECT (p.p_us - v.v_us) // 1000000 AS ttc_s
  FROM v JOIN p ON p.user_id = v.user_id),
r AS (
  SELECT ttc_s,
         row_number() OVER (ORDER BY ttc_s) AS rn,
         COUNT(*) OVER () AS n
  FROM d)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
  CAST((MAX(CASE WHEN rn = (n + 1) // 2 THEN ttc_s END)
        + MAX(CASE WHEN rn = (n + 2) // 2 THEN ttc_s END)) / 2.0
       AS DOUBLE) AS median_ttc_s,
  CAST(MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN ttc_s END) AS BIGINT)
      AS p90_ttc_s
FROM r""")
def funnel_time_to_convert(spark, sf_dir):
    """Funnel latency — seconds from a user's FIRST view to their first
    purchase at-or-after it, summarized as median and p90 (both
    rank-picked over exact integer seconds — the engine-independent
    percentile recipe, no interpolation semantics).  Shape: two
    filtered aggregations joined per user (the funnel_stages chained-
    min pattern), epoch-µs integer arithmetic, then one bounded
    ranking over the CONVERTED-USERS frame (users-sized, not
    events-sized; at 100 TB the rank window keys would move to the
    two-pass top_fraction histogram if converters outgrew a
    partition).  The p90 pick is ⌈0.9·n⌉ = (9n+9)//10 — closed-form
    integer rank on both engines."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    v = (ev.filter(F.col("event_type") == "view")
         .select("user_id", us.alias("us"))
         .groupBy("user_id").agg(F.min("us").alias("v_us")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", us.alias("us"))
         .join(v, "user_id")
         .filter(F.col("us") >= F.col("v_us"))
         .groupBy("user_id").agg(F.min("us").alias("p_us")))
    d = (v.join(p, "user_id")
         .select(F.expr("(p_us - v_us) div 1000000").alias("ttc_s")))
    w = Window.orderBy("ttc_s")
    r = (d.withColumn("rn", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(
             Window.partitionBy())))
    return r.agg(
        F.max("n").cast("long").alias("n_converted"),
        ((F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                       F.col("ttc_s")))
          + F.max(F.when(F.col("rn") == F.expr("(n + 2) div 2"),
                         F.col("ttc_s")))) / 2.0)
        .cast("double").alias("median_ttc_s"),
        F.max(F.when(F.col("rn") == F.expr("(n * 9 + 9) div 10"),
                     F.col("ttc_s"))).cast("long").alias("p90_ttc_s"))


@q("agg_gini_concentration", """
WITH x AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT v, row_number() OVER (ORDER BY v, o_custkey) AS i FROM x),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(i * v) AS BIGINT) AS siv
  FROM r)
SELECT n,
       ROUND((2.0 * CAST(siv AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)))
             - (CAST(n AS DOUBLE) + 1.0) / n, 6) + 0 AS gini
FROM s""")
def agg_gini_concentration(spark, sf_dir):
    """Gini coefficient of customer spending — the concentration /
    inequality metric behind exposure and AML reporting ("what share
    of volume sits with the top accounts?").  Exact closed form over
    sorted ranks: G = 2·Σ i·xᵢ/(n·Σx) − (n+1)/n with x ascending —
    rank and both sums are exact int64 (i·v ≤ 10⁵·10¹⁰ per term),
    floats only in the final expression, canon-zero rounded.  The
    rank is a single global sort window over the CUSTOMER aggregate
    (customers-sized, not orders-sized — the bounded-window
    exception); ``agg_gini_concentration_hist`` is the PROVEN
    billions-of-customers form — identical output, rank from the
    two-pass histogram machinery instead of one task."""
    o = load_table(spark, sf_dir, "orders")
    x = (o.groupBy("o_custkey")
         .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                    .cast("long")).alias("v")))
    w = Window.orderBy("v", "o_custkey")
    r = x.withColumn("i", F.row_number().over(w))
    s = r.agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
              F.sum(F.col("i") * F.col("v")).alias("siv"))
    gini = ((2.0 * F.col("siv").cast("double")
             / (F.col("n").cast("double") * F.col("sv").cast("double")))
            - (F.col("n").cast("double") + 1.0) / F.col("n"))
    return s.select(F.col("n").cast("long").alias("n"),
                    (F.round(gini, 6) + 0).alias("gini"))


@q("agg_gini_concentration_hist", """
WITH x AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT v, row_number() OVER (ORDER BY v, o_custkey) AS i FROM x),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(i * v) AS BIGINT) AS siv
  FROM r)
SELECT n,
       ROUND((2.0 * CAST(siv AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(sv AS DOUBLE)))
             - (CAST(n AS DOUBLE) + 1.0) / n, 6) + 0 AS gini
FROM s""")
def agg_gini_concentration_hist(spark, sf_dir):
    """The billions-of-customers Gini — identical output to
    ``agg_gini_concentration`` (same oracle), but the ascending rank
    comes from ``bucketed_global_rank`` (functions/scale.py): an
    equi-width histogram of the cent totals prefix-sums to per-cell
    rank offsets (≤4096 driver rows, never data) and ``row_number``
    runs per cell in parallel — no single-task corpus sort anywhere in
    the plan.  The sibling proves the scale path the plain entry's
    docstring names, the way ``fact_snapshot_split`` proves the
    flagship's (r8 verdict item 4).  Rank and both sums stay exact
    int64; floats only in the final expression, canon-zero rounded."""
    from aws_etl_bank_spark.functions.scale import bucketed_global_rank

    o = load_table(spark, sf_dir, "orders")
    x = (o.groupBy("o_custkey")
         .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                    .cast("long")).alias("v")))
    r = bucketed_global_rank(x, "v", ["o_custkey"], out_col="i",
                             descending=False)
    s = r.agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
              F.sum(F.col("i") * F.col("v")).alias("siv"))
    gini = ((2.0 * F.col("siv").cast("double")
             / (F.col("n").cast("double") * F.col("sv").cast("double")))
            - (F.col("n").cast("double") + 1.0) / F.col("n"))
    return s.select(F.col("n").cast("long").alias("n"),
                    (F.round(gini, 6) + 0).alias("gini"))


@q("src_avro_datum_roundtrip", """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders WHERE o_orderkey % 10 = 0""")
def src_avro_datum_roundtrip(spark, sf_dir):
    """Avro DATUM encode→decode roundtrip over the orders slice — the
    Kafka/Glue ``unbox(format="avro")`` surface, newly REAL in this
    sandbox: spark-avro's jar is absent, so sources/avro.py implements
    the binary datum codec in pure Python (cross-checked byte-for-byte
    against the org.apache.avro JVM reference in tests/test_avro.py)
    and runs it Arrow-batched inside mapInPandas.  Each row serializes
    to schema-less avro bytes, then decodes back through the same
    jsonFormatSchema contract ``from_avro`` uses; the oracle sees the
    identity, so any codec asymmetry (zigzag, unions, utf-8 lengths)
    fails the hash.  Scale shape: two map-only Arrow passes, no
    shuffle, no driver data."""
    import json as _json

    from aws_etl_bank_spark.sources.avro import (from_avro_datum,
                                                 to_avro_datum)

    schema = _json.dumps({
        "type": "record", "name": "order", "fields": [
            {"name": "o_orderkey", "type": "long"},
            {"name": "o_custkey", "type": "long"},
            {"name": "o_totalprice", "type": "double"},
            {"name": "o_orderstatus", "type": ["null", "string"]}]})
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 10 == 0)
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderstatus"))
    enc = to_avro_datum(
        o, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
        schema, out_col="payload")
    dec = from_avro_datum(enc.select("payload"), "payload", schema,
                          out_col="rec")
    return dec.select(
        F.col("rec.o_orderkey").alias("o_orderkey"),
        F.col("rec.o_custkey").alias("o_custkey"),
        F.col("rec.o_totalprice").alias("o_totalprice"),
        F.col("rec.o_orderstatus").alias("o_orderstatus"))


@q("src_avro_ocf_roundtrip", """
SELECT s_suppkey, s_nationkey, s_acctbal, s_name
FROM supplier""")
def src_avro_ocf_roundtrip(spark, sf_dir):
    """Avro Object Container File write→read through sources/avro.py:
    ``write_avro`` emits one deflate-compressed OCF per partition via
    mapInPandas (distributed, nothing collects), ``read_avro`` lists
    the files with Spark's built-in binaryFile source and decodes each
    partition Arrow-batched — per-file parallelism, the same split
    granularity spark-avro itself achieves on deflate containers.  The
    oracle is the identity on supplier, so header/metadata/sync-marker
    or block-framing bugs fail the roundtrip, not just datum bugs."""
    from aws_etl_bank_spark.sources.avro import read_avro, write_avro

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal", "s_name")
    path = _scratch(sf_dir, "supplier_ocf")
    write_avro(s.repartition(4), path, codec="deflate")
    return read_avro(spark, path)


@q("src_avro_logical_types", """
SELECT event_id,
       ts AS ts_us,
       make_timestamp((epoch_us(ts) // 1000) * 1000) AS ts_ms,
       CAST(ts AS DATE) AS d
FROM events WHERE event_id % 20 = 0""")
def src_avro_logical_types(spark, sf_dir):
    """Avro LOGICAL-type decode (r9 verdict task 6): timestamp-micros /
    timestamp-millis (long) and date (int) roundtrip through the pure-
    Python datum codec (sources/avro.py) as primitives, then
    ``avro_logical_casts`` decorates them back to TIMESTAMP/DATE with
    built-in JVM expressions (timestamp_micros / timestamp_millis /
    date_from_unix_date) — the spark-avro decode-time mapping,
    re-expressed as a codegen-friendly column cast so the codec stays
    primitive.  The oracle recomputes the same truncations with DuckDB
    epoch integer math (`// 1000` millis truncation; epoch micros stay
    well inside int64).  Scale shape: two map-only Arrow passes + pure
    expressions, no shuffle."""
    import json as _json

    from aws_etl_bank_spark.sources.avro import (avro_logical_casts,
                                                 from_avro_datum,
                                                 to_avro_datum)

    schema_d = {
        "type": "record", "name": "ev", "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "ts_us",
             "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "ts_ms",
             "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}}]}
    schema = _json.dumps(schema_d)
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") % 20 == 0)
          .select("event_id",
                  F.col("ts").cast("timestamp").alias("t")))
    src = ev.select(
        "event_id",
        F.unix_micros("t").alias("ts_us"),
        F.expr("unix_micros(t) DIV 1000").alias("ts_ms"),
        F.datediff(F.col("t").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("int").alias("d"))
    enc = to_avro_datum(src, ["event_id", "ts_us", "ts_ms", "d"],
                        schema, out_col="payload")
    dec = from_avro_datum(enc.select("payload"), "payload", schema,
                          out_col="rec")
    flat = dec.select("rec.event_id", "rec.ts_us", "rec.ts_ms", "rec.d")
    return avro_logical_casts(flat, schema_d)


@q("feature_quantile_normalize", """
WITH r AS (
  SELECT event_id, value,
         row_number() OVER (ORDER BY value, event_id) AS rk
  FROM events),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r)
SELECT event_id, value,
       ROUND((CAST(rk AS DOUBLE) - 1.0)
             / (CAST(n.n AS DOUBLE) - 1.0), 6) + 0 AS q
FROM r, n""")
def feature_quantile_normalize(spark, sf_dir):
    """Quantile (rank-gauss style) normalization of a feature over the
    WHOLE corpus — the ML-preprocessing staple that naively needs
    ``percent_rank() OVER ()``: a single-task window at 100 TB.  Here
    the exact global rank comes from ``bucketed_global_rank``
    (functions/scale.py: histogram cells → driver prefix-sum offsets →
    per-cell row_number), so the output is bit-identical to the SQL
    window form while every sort stays cell-local.  q = (rank−1)/(n−1)
    is an IEEE-exact integer division, canon-zero rounded."""
    from aws_etl_bank_spark.functions.scale import bucketed_global_rank

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ranked = bucketed_global_rank(ev, "value", ["event_id"], out_col="rk")
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    return (ranked.crossJoin(F.broadcast(n))
            .select("event_id", "value",
                    (F.round((F.col("rk").cast("double") - 1.0)
                             / (F.col("n").cast("double") - 1.0), 6) + 0)
                    .alias("q")))


@q("agg_rollup_hierarchy", """
SELECT r_name, n_name,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS lvl,
       CAST(COUNT(c_custkey) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP(r_name, n_name)""")
def agg_rollup_hierarchy(spark, sf_dir):
    """ROLLUP along the region→nation hierarchy (the drill-down
    companion of ``agg_cube_grouping``'s CUBE): per-nation, per-region
    subtotal, and grand-total rows in ONE aggregation pass —
    Catalyst expands the rollup into a single Expand+HashAggregate, so
    the fact is scanned once however many levels roll up.  The two dims
    broadcast; money sums in DECIMAL per the exactness rule;
    grouping_id's bit layout (first rollup column = high bit) matches
    GROUPING(r)*2+GROUPING(n) on the oracle side."""
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    j = (c.join(F.broadcast(nat),
                c["c_nationkey"] == nat["n_nationkey"])
         .join(F.broadcast(reg),
               nat["n_regionkey"] == reg["r_regionkey"]))
    return (j.rollup("r_name", "n_name")
            .agg(F.grouping_id().cast("int").alias("lvl"),
                 F.count("c_custkey").alias("n_cust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("total_bal"))
            .select("r_name", "n_name", "lvl", "n_cust", "total_bal"))


@q("label_time_to_event", """
WITH u AS (
  SELECT user_id,
         MIN(ts) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST((epoch_us(CAST(COALESCE(tp, TIMESTAMP '2024-02-01') AS TIMESTAMP))
             - epoch_us(CAST(t0 AS TIMESTAMP))) AS BIGINT) AS duration_us,
       (tp IS NOT NULL) AS observed
FROM u""")
def label_time_to_event(spark, sf_dir):
    """Survival-analysis label extraction: per user, the time from
    first activity to first PURCHASE, right-censored at the horizon
    (2024-02-01) when no purchase happened — the (duration, observed)
    pair every churn/conversion hazard model trains on.  One hash-agg
    over the fact (two conditional MINs — no sessionize, no window);
    durations are unix_micros integer math (the engine-safe epoch
    form), never second-truncating timestamp subtraction."""
    ev = load_table(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.min("ts").alias("t0"),
              F.min(F.when(F.col("event_type") == "purchase",
                           F.col("ts"))).alias("tp")))
    horizon = F.lit("2024-02-01 00:00:00").cast("timestamp")
    dur = (F.unix_micros(F.coalesce(F.col("tp").cast("timestamp"), horizon))
           - F.unix_micros(F.col("t0").cast("timestamp")))
    return u.select("user_id", dur.cast("long").alias("duration_us"),
                    F.col("tp").isNotNull().alias("observed"))


@q("fraud_round_amount_share", """
WITH c AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                            % 10000 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_round
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, n_orders, n_round,
       ROUND(CAST(n_round AS DOUBLE) / n_orders + 0.000000001, 4)
         AS round_share,
       (CAST(n_round AS DOUBLE) / n_orders >= 0.3) AS flagged
FROM c""")
def fraud_round_amount_share(spark, sf_dir):
    """Round-amount structuring screen — the AML heuristic that flags
    customers whose orders cluster on whole-hundred amounts (classic
    smurfing tell).  Cents via the house ``floor(x·100+0.5)`` money
    canon make "round" an exact integer predicate; the FLAG compares
    the raw IEEE-exact ratio (never the rounded rendering — the
    containment-fix convention), the displayed share gets the 1e-9
    half-tie nudge.  One hash-agg, map-side combinable."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    c = (o.groupBy("o_custkey")
         .agg(F.count(F.lit(1)).alias("n_orders"),
              F.sum(F.when(cents % 10000 == 0, 1).otherwise(0))
              .cast("long").alias("n_round")))
    raw = F.col("n_round").cast("double") / F.col("n_orders")
    return c.select(
        "o_custkey", "n_orders", "n_round",
        F.round(raw + F.lit(1e-9), 4).alias("round_share"),
        (raw >= 0.3).alias("flagged"))


@q("agg_partial_merge", """
SELECT o_custkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1, 2""")
def agg_partial_merge(spark, sf_dir):
    """Re-aggregatable partial aggregates — the incremental-pipeline
    pattern: DAILY (custkey, day) partials roll up to the MONTHLY
    answer by summing sums and summing counts, proving the partial
    state is mergeable (what lets a 100 TB daily job feed monthly
    marts without rescanning the fact; the batch mirror of the
    streaming OHLC/KMV incremental entries).  The oracle aggregates
    the fact directly — any non-decomposable leak (an avg taken too
    early, a count double-merged) breaks the hash.  Cents int64 per
    the money canon."""
    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy("o_custkey",
                       F.to_date("o_orderdate").alias("day"))
             .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                        .cast("long")).alias("cents"),
                  F.count(F.lit(1)).alias("n")))
    return (daily.groupBy("o_custkey",
                          F.trunc("day", "month").alias("month"))
            .agg(F.sum("cents").cast("long").alias("cents"),
                 F.sum("n").cast("long").alias("n")))


@q("feature_quantile_normalize_grouped", """
WITH r AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_id, event_type, value,
       ROUND((CAST(rk AS DOUBLE) - 1.0)
             / (CAST(n AS DOUBLE) - 1.0), 6) + 0 AS q
FROM r""")
def feature_quantile_normalize_grouped(spark, sf_dir):
    """PER-GROUP quantile normalization (value → within-event-type
    quantile) via ``bucketed_rank_by_group`` (functions/scale.py): the
    grouped rank machinery where per-group histogram offsets
    prefix-sum in a ≤n_buckets-row window and row_number runs per
    (group, cell) — so a HOT group's sort splits across its cells
    instead of serializing one task, and NOTHING collects to the
    driver (billions of groups are fine).  Group sizes come from the
    same cell counts at zero extra cost.  Bit-identical to the
    PARTITION BY window form the oracle runs."""
    from pyspark.sql import Window as W

    from aws_etl_bank_spark.functions.scale import bucketed_rank_by_group

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    ranked = bucketed_rank_by_group(ev, ["event_type"], "value",
                                    ["event_id"], out_col="rk")
    n = (ev.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n")))
    # null-safe count join: groupBy (and the oracle's PARTITION BY)
    # keep NULL event_type as a real group, a plain equi-join would
    # drop its rows (r9 ADVICE, medium — same hole as the stats join
    # inside bucketed_rank_by_group, fixed there too)
    return (ranked.join(n, ranked["event_type"].eqNullSafe(n["event_type"]))
            .select(ranked["event_id"], ranked["event_type"],
                    ranked["value"],
                    (F.round((F.col("rk").cast("double") - 1.0)
                             / (F.col("n").cast("double") - 1.0), 6) + 0)
                    .alias("q")))


@q("win_dist_family_by_user", """
SELECT event_id, user_id,
       ROUND(percent_rank() OVER w + 0.000000001, 6) AS pr,
       ROUND(cume_dist() OVER w + 0.000000001, 6) AS cd,
       CAST(ntile(3) OVER w AS INT) AS tercile,
       first_value(event_id) OVER w AS first_ev,
       nth_value(event_id, 2) OVER w AS second_ev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)""")
def win_dist_family_by_user(spark, sf_dir):
    """The DISTRIBUTION window family (§2.5 completion next to the
    rank/lead-lag family entry): percent_rank, cume_dist, ntile,
    first_value and nth_value over per-user frames — one Window node,
    one shuffle on user_id, every function sharing the same sort.
    percent_rank/cume_dist are exact small-int divisions; the 1e-9
    half-tie nudge canon applies to their 6-decimal rendering.
    nth_value uses the default frame (unbounded preceding → current
    row) on BOTH engines, so rows before the 2nd of their user are
    NULL — frame semantics, not a quirk."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.round(F.percent_rank().over(w) + F.lit(1e-9), 6).alias("pr"),
        F.round(F.cume_dist().over(w) + F.lit(1e-9), 6).alias("cd"),
        F.ntile(3).over(w).cast("int").alias("tercile"),
        F.first("event_id").over(w).alias("first_ev"),
        F.nth_value("event_id", 2).over(w).alias("second_ev"))


@q("maintenance_compact_small_files", """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier""")
def maintenance_compact_small_files(spark, sf_dir):
    """Small-files compaction — the table-maintenance chore every
    100 TB lake runs nightly: a fragmented write (64 shards of a
    supplier snapshot — the many-small-files pathology that slows
    every downstream scan's task scheduling and footer reads) is
    compacted by a size-targeted coalesce (ceil(bytes/128 MiB),
    floor 1: coalesce NARROWS — no shuffle, files merge within
    executors) and read back.  The oracle is the identity, so a
    dropped or duplicated row in either write fails the hash; the
    file counts before/after are asserted in tests, not here, to keep
    the result deterministic."""
    import math

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    frag_path = _scratch(sf_dir, "supplier_fragmented")
    s.repartition(64).write.mode("overwrite").parquet(frag_path)
    frag = spark.read.parquet(frag_path)
    total_bytes = sum(
        f.stat().st_size for f in os.scandir(frag_path)
        if f.name.endswith(".parquet"))
    target = max(1, math.ceil(total_bytes / (128 * 1024 * 1024)))
    out_path = _scratch(sf_dir, "supplier_compacted")
    frag.coalesce(target).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


@q("ts_rolling_median_k7", """
WITH l AS (
  SELECT event_id, user_id, ts, value,
         list_sort(list(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 6 PRECEDING
                                              AND CURRENT ROW)) AS win
  FROM events)
SELECT event_id, user_id,
       CAST(len(win) AS INT) AS k,
       CAST(win[(len(win) + 1) // 2] AS DOUBLE) AS rolling_median
FROM l""")
def ts_rolling_median_k7(spark, sf_dir):
    """Rolling LOWER median of the last ≤7 events per user — the
    robust-smoothing alternative to the rolling mean every
    fraud/telemetry screen wants (one outlier can't move it).  Spark
    has no percentile over sliding frames, but a BOUNDED frame makes
    the array form exact and cheap: collect_list over the 7-row frame,
    array_sort, pick element (k+1)/2 — per-row work is O(k log k) with
    k pinned at 7, and the only shuffle is the user_id window's.  The
    lower median is a VALUE PICK, never interpolation arithmetic, so
    both engines agree bit-for-bit on doubles (the rank-picked canon
    from the percentile entries)."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-6, 0))
    arr = F.array_sort(F.collect_list("value").over(w))
    k = F.size(arr)
    return (ev.select(
        "event_id", "user_id", arr.alias("win"), k.alias("k"))
        .select("event_id", "user_id", F.col("k").cast("int").alias("k"),
                F.element_at("win", F.floor((F.col("k") + 1) / 2)
                             .cast("int"))
                .cast("double").alias("rolling_median")))


@q("quality_k_anonymity", """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS grp_n
  FROM customer GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(grp_n) AS BIGINT) AS min_group,
       CAST(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
         AS n_below_k,
       ROUND(SUM(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END)
             / CAST(SUM(grp_n) AS DOUBLE) + 0.000000001, 6)
         AS share_below_k
FROM g""")
def quality_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the (nation, market-segment)
    quasi-identifier — the privacy gate a bank runs before sharing a
    dataset: how many customers sit in equivalence classes smaller
    than k=5 (each one re-identifiable by the QI combination alone).
    Two hash-aggs — QI-class counts, then a 1-row scorecard — the
    100 TB scan reduces immediately; share rendered with the house
    nudge-round."""
    c = load_table(spark, sf_dir, "customer")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count(F.lit(1)).alias("grp_n")))
    below = F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0)
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("grp_n").cast("long").alias("min_group"),
        F.sum(below).cast("long").alias("n_below_k"),
        F.round(F.sum(below).cast("double") / F.sum("grp_n")
                + F.lit(1e-9), 6).alias("share_below_k"))


@q("stream_avro_ingest", """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM events GROUP BY event_type""")
def stream_avro_ingest(spark, sf_dir):
    """Streaming ingest of Avro DATUM payloads — the Kafka topology
    every bank runs (schema-less avro value bytes per message),
    minus the broker: events serialize to avro payload files (our
    pure-Python codec, sources/avro.py), a file stream replays them
    in micro-batches, and each batch decodes via ``from_avro_datum``
    inside foreachBatch before appending to the bronze sink.  The
    oracle aggregates the ORIGINAL table, so the equality proves the
    encode→stream→decode loop is lossless end-to-end, micro-batch
    boundaries included.  Decode is Arrow-batched per micro-batch;
    nothing corpus-sized crosses the driver."""
    import json as _json
    import time as _time

    from aws_etl_bank_spark.sources.avro import (from_avro_datum,
                                                 to_avro_datum)
    from aws_etl_bank_spark.streaming import for_each_batch

    schema = _json.dumps({
        "type": "record", "name": "ev", "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "event_type", "type": ["null", "string"]},
            {"name": "value", "type": "double"}]})
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    src = _scratch(sf_dir, "avro_stream_src")
    (to_avro_datum(ev, ["event_id", "event_type", "value"], schema,
                   out_col="payload")
     .select("payload").repartition(3)
     .write.mode("overwrite").parquet(src))
    sink = _scratch(sf_dir, f"avro_stream_sink_{int(_time.time() * 1000)}")

    def handle(batch_df, batch_id):
        dec = from_avro_datum(batch_df, "payload", schema, out_col="rec")
        (dec.select(F.col("rec.event_type").alias("event_type"),
                    F.col("rec.value").alias("value"))
         .write.mode("append").parquet(sink))

    stream = (spark.readStream.schema("payload binary")
              .option("maxFilesPerTrigger", 1).parquet(src))
    for_each_batch(stream, handle, {
        "windowSize": "1 seconds",
        "checkpointLocation": _scratch(
            sf_dir, f"avro_stream_ckpt_{int(_time.time() * 1000)}"),
        "availableNow": True,
    })
    out = spark.read.parquet(sink)
    return (out.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                 .cast("long").alias("cents")))


@q("catalog_analyze_columns", """
WITH s AS (
  SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS v FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders)
SELECT col, CAST(COUNT(v) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv
FROM s GROUP BY col""")
def catalog_analyze_columns(spark, sf_dir):
    """ANALYZE-style column statistics (non-null count + exact NDV per
    column) — what a catalog's cost-based optimizer feeds on and what
    every data-quality dashboard trends.  ONE scan: ``stack`` unpivots
    the four profiled columns to (col, value) rows — versus the naive
    four-count-distinct aggregate, whose Expand inflates the SHUFFLE
    by the column count too; here the expand feeds a map-side-combined
    (col, v) dedup agg, so the exchange carries distinct values only.
    Discrete columns keyed as strings (injective render — doubles are
    deliberately absent: their engine-specific rendering isn't)."""
    o = load_table(spark, sf_dir, "orders")
    s = o.select(F.expr(
        "stack(4, 'o_orderkey', CAST(o_orderkey AS STRING), "
        "'o_custkey', CAST(o_custkey AS STRING), "
        "'o_orderstatus', o_orderstatus, "
        "'o_orderpriority', o_orderpriority) AS (col, v)"))
    d = s.groupBy("col", "v").agg(F.count(F.lit(1)).alias("c"))
    return (d.groupBy("col")
            .agg(F.sum(F.when(F.col("v").isNotNull(), F.col("c"))
                       .otherwise(0)).cast("long").alias("n_nonnull"),
                 F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0))
                 .cast("long").alias("ndv")))


@q("join_null_safe_equi", """
WITH l AS (
  SELECT CASE WHEN o_custkey % 97 = 0 THEN NULL ELSE o_custkey END AS k,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1),
r AS (
  SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k,
         c_name
  FROM customer)
SELECT l.k, l.n_orders, r.c_name
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k""")
def join_null_safe_equi(spark, sf_dir):
    """NULL-safe equi-join (``<=>`` / IS NOT DISTINCT FROM) — the
    join every late-arriving-dimension pipeline needs when "unknown"
    keys must MATCH each other instead of silently dropping (a plain
    equi-join's NULL never equals NULL).  Spark plans ``<=>`` as a
    hash-join key like any other (NULLs hash to one partition — which
    is also why the null group is the canonical skew key at 100 TB:
    the aggregate-before-join here keeps it one row on the left).
    Oracle: the same join under DuckDB's IS NOT DISTINCT FROM."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    null_if = lambda col: F.when(F.col(col) % 97 == 0,  # noqa: E731
                                 F.lit(None)).otherwise(F.col(col))
    left = (o.select(null_if("o_custkey").alias("k"))
            .groupBy("k").agg(F.count(F.lit(1)).cast("long")
                              .alias("n_orders")))
    right = c.select(null_if("c_custkey").alias("k"), "c_name")
    return (left.join(right, left["k"].eqNullSafe(right["k"]))
            .select(left["k"].alias("k"), "n_orders", "c_name"))


@q("ops_schema_merge_evolution", """
SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) AS s_acctbal,
       CAST(NULL AS INTEGER) AS s_nationkey
FROM supplier
UNION ALL
SELECT s_suppkey, CAST(NULL AS VARCHAR), s_acctbal, s_nationkey
FROM supplier""")
def ops_schema_merge_evolution(spark, sf_dir):
    """Schema evolution on read (``mergeSchema``) — the lake reality
    that a table's files were written by DIFFERENT pipeline versions:
    generation 1 wrote (suppkey, name), generation 2 added
    (acctbal, nationkey) and dropped name; a merged read must union
    the schemas and NULL-pad each generation's missing columns, never
    error and never silently project to the first footer.  Spark's
    parquet mergeSchema does exactly that from the file footers alone
    (no catalog); the oracle constructs the same union explicitly.
    Footer merging is a driver-side metadata pass over file FOOTERS,
    not data — at 100 TB you cap it with a catalog schema instead,
    which is why the entry documents both."""
    s = load_table(spark, sf_dir, "supplier")
    base = _scratch(sf_dir, "evolving_table")
    (s.select("s_suppkey", "s_name")
     .write.mode("overwrite").parquet(os.path.join(base, "gen=1")))
    (s.select("s_suppkey", "s_acctbal", "s_nationkey")
     .write.mode("overwrite").parquet(os.path.join(base, "gen=2")))
    merged = (spark.read.option("mergeSchema", "true")
              .option("recursiveFileLookup", "true").parquet(base))
    return merged.select("s_suppkey", "s_name", "s_acctbal",
                         "s_nationkey")


@q("ops_observe_metrics", """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_cents,
       CAST(COUNT(*) FILTER (WHERE l_quantity > 10) AS BIGINT) AS n_big
FROM lineitem""")
def ops_observe_metrics(spark, sf_dir):
    """Pipeline-embedded metrics via ``DataFrame.observe`` +
    ``Observation`` — the production pattern for row-count / checksum
    telemetry WITHOUT a second scan: the observed aggregates ride the
    same physical plan as the real job (here a downstream filter+count
    action) and surface on the driver when the action finishes, so a
    100 TB job gets its reconciliation totals for free instead of
    re-reading the table.  The quantity checksum uses exact int64
    cents (the money canon).  The oracle recomputes all three metrics
    declaratively; the driver-side work is ONE bounded metrics row."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_quantity") * 100).cast("long")).alias("qty_cents"))
    n_big = observed.filter(F.col("l_quantity") > 10).count()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["qty_cents"], n_big)],
        "n_rows long, qty_cents long, n_big long")


@q("udaf_grouped_weighted_mean", """
WITH w AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         event_id % 5 + 1 AS wt
  FROM events)
SELECT event_type,
       CAST(SUM(cents * wt) AS BIGINT) AS ws,
       CAST(SUM(wt) AS BIGINT) AS tw,
       ROUND(CAST(SUM(cents * wt) AS DOUBLE) / SUM(wt), 6) AS wmean_cents
FROM w GROUP BY event_type""")
def udaf_grouped_weighted_mean(spark, sf_dir):
    """The Python UDAF surface (grouped-agg pandas UDF, §2.12's
    documented upgrade path) doing a weighted mean over exact int64
    cents — the weighted sum flows through the Arrow UDAF, the weight
    total through a built-in SUM in the SAME aggregation, and the mean
    is one IEEE-exact division.  The oracle computes the identical
    SUM(v·w)/SUM(w) natively: equality proves the UDAF path is exact,
    and the docstring (functions/udf.py) records why built-ins win
    when the aggregate IS decomposable — a grouped-agg UDF sees the
    whole group in memory, no map-side combine."""
    from aws_etl_bank_spark.functions.udf import weighted_cents_udaf

    wc, int_sum = weighted_cents_udaf()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (F.col("event_id") % 5 + 1).alias("wt"))
    return (ev.groupBy("event_type")
            .agg(wc("cents", "wt").alias("ws"),
                 int_sum("wt").alias("tw"))
            .select("event_type", "ws", "tw",
                    F.round(F.col("ws").cast("double") / F.col("tw"), 6)
                    .alias("wmean_cents")))


@q("udtf_sentence_split", r"""
WITH p AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\.\s+'),
                     x -> x <> '') AS pieces
  FROM documents WHERE doc_id % 20 = 0),
s AS (
  SELECT doc_id,
         unnest(pieces) AS sentence,
         CAST(unnest(range(len(pieces))) AS INT) AS sent_idx
  FROM p)
SELECT doc_id, sent_idx, sentence,
       CAST(len(list_filter(string_split_regex(sentence, '\s+'),
                            w -> w <> '')) AS INT) AS n_words
FROM s""")
def udtf_sentence_split(spark, sf_dir):
    """The Python UDTF surface (§2.12's other upgrade path): a lateral
    table function fanning each document into per-sentence rows with
    index and word count — the row-generating shape (parse trees,
    chunkers, tokenizers) that scalar UDFs can't express and explode
    can only fake by materializing the whole array per row first.
    Runs as a generator per partition under Arrow; the LATERAL join
    keeps everything distributed.  Oracle mirrors the split + filter
    conventions exactly."""
    from aws_etl_bank_spark.functions.udf import sentence_split_udtf

    SentenceSplit = sentence_split_udtf()
    spark.udtf.register("sent_split_r9", SentenceSplit)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.sent_idx, s.sentence, s.n_words "
        "FROM __udtf_docs, LATERAL sent_split_r9(text) s")


@q("quality_l_diversity", """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS grp_n,
         CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT))
              AS BIGINT) AS n_sensitive
  FROM customer GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(n_sensitive) AS BIGINT) AS min_diversity,
       CAST(SUM(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_below_l,
       CAST(SUM(CASE WHEN n_sensitive < 3 THEN grp_n ELSE 0 END) AS BIGINT)
         AS rows_below_l
FROM g""")
def quality_l_diversity(spark, sf_dir):
    """l-diversity audit — k-anonymity's stronger sibling
    (quality_k_anonymity): a QI class can be large yet still leak if
    every member shares the SAME sensitive value, so the gate is
    distinct-sensitive-values per (nation, segment) class, l=3, with
    balance band floor(acctbal/2000) as the sensitive attribute.  Two
    hash-aggs and a 1-row scorecard; the count-distinct is per-group
    (bounded by band cardinality), so the 100 TB scan reduces
    immediately and nothing skews."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 2000).cast("long")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count(F.lit(1)).alias("grp_n"),
              F.countDistinct(band).alias("n_sensitive")))
    below = F.col("n_sensitive") < 3
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("n_sensitive").cast("long").alias("min_diversity"),
        F.sum(F.when(below, 1).otherwise(0)).cast("long")
        .alias("groups_below_l"),
        F.sum(F.when(below, F.col("grp_n")).otherwise(0)).cast("long")
        .alias("rows_below_l"))


@q("score_ks_statistic", """
WITH s AS (
  SELECT o_totalprice AS x,
         CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS a,
         CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END AS b
  FROM orders),
g AS (SELECT x, CAST(SUM(a) AS BIGINT) AS da,
             CAST(SUM(b) AS BIGINT) AS db
      FROM s GROUP BY x),
c AS (SELECT x,
             CAST(SUM(da) OVER (ORDER BY x) AS BIGINT) AS ca,
             CAST(SUM(db) OVER (ORDER BY x) AS BIGINT) AS cb
      FROM g),
n AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
             CAST(SUM(b) AS BIGINT) AS nb FROM s)
SELECT x AS threshold,
       CAST(ABS(ca * nb - cb * na) AS BIGINT) AS diff_units,
       ROUND(ABS(ca * nb - cb * na) / CAST(na * nb AS DOUBLE)
             + 0.000000001, 6) AS ks
FROM c, n
ORDER BY ABS(ca * nb - cb * na) DESC, x LIMIT 1""")
def score_ks_statistic(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic (open vs
    non-open order price distributions) — the model-monitoring /
    population-drift metric next to score_psi_drift, computed with
    INTEGER math end to end: per-threshold cumulative counts come
    from ``bucketed_cumsum`` (functions/scale.py — the running-sum
    sibling of bucketed_global_rank: per-cell totals prefix-summed on
    the driver, within-cell window partitioned by cell, NO
    single-task ORDER BY window), the sup statistic compares
    |ca*nb − cb*na| in int64 (association-free), and the only float
    op is the final division, rendered with the house nudge-round.
    The oracle is the plain window-SQL form."""
    from aws_etl_bank_spark.functions.scale import bucketed_cumsum

    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("a"),
        F.when(F.col("o_orderstatus") != "O", 1).otherwise(0).alias("b"))
    g = (s.groupBy("x")
         .agg(F.sum("a").cast("long").alias("da"),
              F.sum("b").cast("long").alias("db")))
    c = bucketed_cumsum(g, "x", ["da", "db"])
    n = s.agg(F.sum("a").cast("long").alias("na"),
              F.sum("b").cast("long").alias("nb"))
    diff = F.abs(F.col("cum_da") * F.col("nb")
                 - F.col("cum_db") * F.col("na"))
    return (c.crossJoin(F.broadcast(n))
            .select(F.col("x").alias("threshold"),
                    diff.cast("long").alias("diff_units"),
                    F.round(diff / (F.col("na") * F.col("nb"))
                            .cast("double") + F.lit(1e-9), 6).alias("ks"))
            .orderBy(F.desc("diff_units"), "threshold").limit(1))


@q("ops_partition_file_stats", """
SELECT CAST(s_nationkey AS INTEGER) AS s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(1 AS BIGINT) AS n_files
FROM supplier GROUP BY 1""")
def ops_partition_file_stats(spark, sf_dir):
    """Partition-layout introspection via the hidden ``_metadata``
    column — the ops view a lake needs before compaction/pruning
    decisions: write supplier hive-partitioned by nation (one file per
    partition via repartition on the partition key), read it back, and
    aggregate rows + DISTINCT physical files per partition from
    ``_metadata.file_path`` (no directory listing in user code; the
    source exposes its own layout).  The oracle recomputes rows per
    nation declaratively and pins the 1-file-per-partition layout the
    repartition guarantees.  Partition values surface as the read
    schema's partition column; counts prove discovery saw every file."""
    s = load_table(spark, sf_dir, "supplier")
    path = _scratch(sf_dir, "supplier_hive")
    (s.repartition("s_nationkey")
     .write.mode("overwrite").partitionBy("s_nationkey").parquet(path))
    back = spark.read.parquet(path)
    return (back.select(F.col("s_nationkey").cast("int").alias("s_nationkey"),
                        F.col("_metadata.file_path").alias("fp"))
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("fp").alias("n_files"))
            .select("s_nationkey",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    F.col("n_files").cast("long").alias("n_files")))


@q("ops_table_reconcile_buckets", """
WITH a AS (
  SELECT o_orderkey % 64 AS bucket,
         CAST('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' ||
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
             o_orderstatus), 1, 15) AS BIGINT) AS h
  FROM orders),
b AS (
  SELECT o_orderkey % 64 AS bucket,
         CAST('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' ||
             CAST(CAST(CASE WHEN o_orderkey % 13 = 0
                            THEN o_totalprice + 1.5
                            ELSE o_totalprice END
                       AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
             o_orderstatus), 1, 15) AS BIGINT) AS h
  FROM orders WHERE o_orderkey % 89 <> 0),
ga AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_a,
              CAST(bit_xor(h) AS BIGINT) AS x_a
       FROM a GROUP BY bucket),
gb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
              CAST(bit_xor(h) AS BIGINT) AS x_b
       FROM b GROUP BY bucket)
SELECT CAST(COALESCE(ga.bucket, gb.bucket) AS BIGINT) AS bucket,
       COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
FROM ga FULL OUTER JOIN gb ON ga.bucket = gb.bucket
WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0)
   OR COALESCE(x_a, 0) <> COALESCE(x_b, 0)""")
def ops_table_reconcile_buckets(spark, sf_dir):
    """Hash-bucket table reconciliation — how two 100 TB table copies
    are compared WITHOUT moving rows: each side reduces to 64 bucket
    fingerprints (row count + bit_xor of a canonical row hash — XOR is
    order-free and overflow-free, unlike a SUM of 60-bit hashes), and
    only fingerprint-mismatched buckets surface for row-level digging.
    The row hash is the engine-portable md5→int64 canon
    (conv(substr(md5,1,15))) over key|price|status with the price
    rendered through DECIMAL(18,2) so both engines hash identical
    bytes; side B injects %13 reprices and %89 deletes.  Two scans,
    two 64-row hash-aggs, one 64-row join."""
    o = load_table(spark, sf_dir, "orders")

    def hashed(price_col):
        s = F.concat_ws(
            "|", F.col("o_orderkey").cast("string"),
            price_col.cast("decimal(18,2)").cast("string"),
            F.col("o_orderstatus"))
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")

    a = o.select((F.col("o_orderkey") % 64).alias("bucket"),
                 hashed(F.col("o_totalprice")).alias("h"))
    newprice = F.when(F.col("o_orderkey") % 13 == 0,
                      F.col("o_totalprice") + 1.5) \
        .otherwise(F.col("o_totalprice"))
    b = (o.filter(F.col("o_orderkey") % 89 != 0)
         .select((F.col("o_orderkey") % 64).alias("bucket"),
                 hashed(newprice).alias("h")))
    ga = a.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_a"),
                                 F.bit_xor("h").alias("x_a"))
    gb = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_b"),
                                 F.bit_xor("h").alias("x_b"))
    # FULL OUTER on bucket (r10 ADVICE): a bucket entirely absent from
    # one copy (all its rows deleted) must surface as a mismatch, not
    # vanish from the report — an inner join hides exactly the worst
    # diff.  COALESCE counts/xors to 0 so the one-sided comparison is
    # well-defined (the USING-column join coalesces bucket itself).
    zero = F.lit(0).cast("long")
    return (ga.join(gb, "bucket", "full_outer")
            .withColumn("n_a", F.coalesce("n_a", zero))
            .withColumn("n_b", F.coalesce("n_b", zero))
            .filter((F.col("n_a") != F.col("n_b"))
                    | (F.coalesce("x_a", zero) != F.coalesce("x_b", zero)))
            .select(F.col("bucket").cast("long").alias("bucket"),
                    "n_a", "n_b"))


@q("catalog_equidepth_histogram", """
WITH r AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
  FROM orders),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders),
t AS (SELECT unnest(range(1, 9)) AS i)
SELECT CAST(t.i AS INT) AS q,
       CAST(r.rk AS BIGINT) AS rk,
       r.o_totalprice AS boundary
FROM r, n, t
WHERE r.rk = (t.i * n.c + 7) // 8""")
def catalog_equidepth_histogram(spark, sf_dir):
    """Equi-depth histogram boundaries (the CBO statistics a catalog's
    ANALYZE collects, next to catalog_analyze_columns' NDV): the order
    price at ranks ceil(i·n/8), i=1..8, EXACT — ranks come from
    ``bucketed_global_rank`` (histogram cells + per-cell row_number,
    no single-task ORDER BY window), boundary targets from integer
    math ((i·n+7) div 8), and the 8 target ranks broadcast-join
    against the ranked frame.  The oracle is the plain window form.
    One corpus scan + the rank machinery's two bounded passes."""
    from aws_etl_bank_spark.functions.scale import bucketed_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey")
    ranked = bucketed_global_rank(o, "o_totalprice", ["o_orderkey"],
                                  out_col="rk")
    n = o.count()
    targets = [(i, (i * n + 7) // 8) for i in range(1, 9)]
    t = spark.createDataFrame(targets, "q int, rk long")
    return (ranked.join(F.broadcast(t), "rk")
            .select("q", F.col("rk").cast("long").alias("rk"),
                    F.col("o_totalprice").alias("boundary")))


@q("src_python_datasource", """
SELECT s_suppkey, s_nationkey, s_acctbal, s_name FROM supplier""")
def src_python_datasource(spark, sf_dir):
    """Custom PYTHON DataSource (Spark 4 ``pyspark.sql.datasource``) —
    the modern form of the reference's custom-connector dispatch
    (getSource(connection_type=...)): sources/pyds.py registers a
    pyarrow-backed parquet reader whose ``partitions()`` lists the
    file's ROW GROUPS (driver reads only the footer) and whose tasks
    yield Arrow RecordBatches for just their row group — a
    Python-defined connector that still parallelizes like a native
    scan and never builds Python row objects.  Identity oracle over
    supplier, so framing/typing bugs in the connector fail the hash."""
    import os

    from aws_etl_bank_spark.sources.pyds import PyArrowParquetDataSource

    try:
        spark.dataSource.register(PyArrowParquetDataSource)
    except Exception:
        pass  # already registered in this session
    return (spark.read.format("pyarrow_parquet")
            .option("path", os.path.join(sf_dir, "supplier.parquet"))
            .option("columns", "s_suppkey,s_nationkey,s_acctbal,s_name")
            .load())


@q("src_python_datasource_writer", """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders WHERE o_orderkey % 7 = 0""")
def src_python_datasource_writer(spark, sf_dir):
    """WRITER half of the custom Python DataSource (the Spark 4
    ``DataSourceArrowWriter`` API, sources/pyds.py): each task streams
    its Arrow RecordBatches into one parquet file (write-then-rename,
    atomic per task; abort deletes the files named in the commit
    messages), so the Python-defined sink parallelizes like a native
    write and never materializes Python rows.  Round-trip through the
    native parquet reader with an identity oracle — framing/typing
    bugs in the writer fail the hash."""
    from aws_etl_bank_spark.sources.pyds import PyArrowParquetDataSource

    try:
        spark.dataSource.register(PyArrowParquetDataSource)
    except Exception:
        pass  # already registered in this session
    df = (load_table(spark, sf_dir, "orders")
          .where(F.col("o_orderkey") % 7 == 0)
          .select("o_orderkey", "o_custkey", "o_totalprice",
                  "o_orderstatus"))
    path = _scratch(sf_dir, "pyds_writer")
    (df.repartition(4).write.format("pyarrow_parquet")
       .mode("overwrite").option("path", path).save())
    return spark.read.parquet(path)


@q("arrow_grouped_apply", """
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
g AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM c GROUP BY o_custkey)
SELECT c.o_orderkey, c.o_custkey,
       CAST(c.cents * g.cnt - g.total AS BIGINT) AS scaled_delta
FROM c JOIN g USING (o_custkey)""")
def arrow_grouped_apply(spark, sf_dir):
    """``groupBy().applyInArrow`` (Spark 4): the grouped-map surface
    with the whole group handed to Python as ONE ``pyarrow.Table`` —
    no pandas conversion, integer kernels run on Arrow buffers.  The
    kernel emits each order's mean-free spend as the exact-integer
    form cents·n − Σcents (no division, so the SQL oracle reproduces
    it bit-for-bit).  Grouping key is o_custkey — per-group size is
    orders-per-customer (~10), so groups stay cache-sized at any SF;
    the shuffle is the same hash-partition an aggregate would do."""
    import pyarrow as pa
    import pyarrow.compute as pc

    c = (load_table(spark, sf_dir, "orders")
         .select("o_orderkey", "o_custkey",
                 F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                 .cast("long").alias("cents")))

    def kernel(table: pa.Table) -> pa.Table:
        cents = table.column("cents")
        total = pc.sum(cents).as_py() or 0
        n = table.num_rows
        delta = pc.subtract(
            pc.multiply(cents, pa.scalar(n, pa.int64())),
            pa.scalar(total, pa.int64()))
        return pa.table({"o_orderkey": table.column("o_orderkey"),
                         "o_custkey": table.column("o_custkey"),
                         "scaled_delta": delta})

    return c.groupBy("o_custkey").applyInArrow(
        kernel, "o_orderkey bigint, o_custkey bigint, scaled_delta bigint")


@q("arrow_udf_scalar", """
WITH c AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderpriority
  FROM orders)
SELECT o_orderkey,
       CAST(cents + cents // 10 AS BIGINT) AS with_surcharge,
       UPPER(o_orderpriority) AS pri
FROM c""")
def arrow_udf_scalar(spark, sf_dir):
    """``F.arrow_udf`` (Spark 4.1): scalar UDFs whose batches arrive
    as ``pyarrow.Array`` — the Arrow-native tier above pandas_udf
    (no pandas materialization at all).  Integer surcharge math and a
    utf8 upper both run as single pyarrow.compute kernel calls per
    batch; values are exact ints/strings, so the SQL oracle
    hash-checks the whole path.  Map-only plan: zero exchanges,
    the UDF sits inside the scan's project."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    # NOTE: real pa.Array annotations, not strings — registry.py runs
    # under `from __future__ import annotations`, which would turn
    # hints into strings and trip arrow_udf's signature check, so the
    # hints are attached explicitly.
    def _with_surcharge(cents):
        # pyarrow integer divide truncates; inputs are positive cents
        # so truncation == floor == DuckDB's // semantics
        return pc.add(cents, pc.divide(cents, pa.scalar(10, pa.int64())))

    def _upper(s):
        return pc.utf8_upper(s)

    _with_surcharge.__annotations__ = {"cents": pa.Array,
                                       "return": pa.Array}
    _upper.__annotations__ = {"s": pa.Array, "return": pa.Array}
    with_surcharge = arrow_udf(_with_surcharge, "long")
    upper = arrow_udf(_upper, "string")

    o = load_table(spark, sf_dir, "orders")
    cents = (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
             .cast("long"))
    return o.select(
        "o_orderkey",
        with_surcharge(cents).alias("with_surcharge"),
        upper(F.col("o_orderpriority")).alias("pri"))


@q("udf_sql_scalar", """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band,
       FLOOR(o_totalprice * 1.5 + 0.5) / 100 AS fee
FROM orders""")
def udf_sql_scalar(spark, sf_dir):
    """SQL scalar UDFs (Spark 4 ``CREATE FUNCTION ... RETURNS ...
    RETURN expr``) — the §2.12 surface done RIGHT for 100 TB: unlike a
    Python UDF the body is inlined into the Catalyst plan (stays
    inside whole-stage codegen, vectorizes, costs zero serialization),
    so shared business logic (price banding, fee schedules) lives in
    one catalog definition instead of N copied expressions.  Two
    functions defined once, used in one projection; the oracle inlines
    the same expressions."""
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'low'
                    WHEN p < 150000 THEN 'mid'
                    ELSE 'high' END""")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION fee(p DOUBLE)
        RETURNS DOUBLE
        RETURN FLOOR(p * 1.5 + 0.5) / 100""")
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__udfsql_orders")
    return spark.sql("""
        SELECT o_orderkey, price_band(o_totalprice) AS band,
               fee(o_totalprice) AS fee
        FROM __udfsql_orders""")


@q("scalar_variant_suite", """
WITH j AS (
  SELECT o_orderkey,
         '{"status":"' || o_orderstatus || '","price":' ||
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) ||
         ',"nums":[3,7,11]}' AS doc
  FROM orders)
SELECT o_orderkey,
       json_extract_string(doc, '$.status') AS status,
       CAST(json_extract(doc, '$.price') AS DOUBLE) AS price,
       CAST(json_extract(doc, '$.nums[2]') AS INT) AS third_num,
       CAST(json_extract(doc, '$.missing') IS NULL AS BOOLEAN) AS miss
FROM j""")
def scalar_variant_suite(spark, sf_dir):
    """The VARIANT semi-structured type (Spark 4 ``parse_json`` +
    ``variant_get``) — the shredded-binary successor to
    string-JSON-with-get_json_object (scalar_json_suite): parse once
    into VARIANT, then typed path extraction per field.  At 100 TB the
    difference is structural: VARIANT decodes the document ONCE into a
    binary form whose fields extract without re-parsing, and the
    encoding is columnar-shreddable.  try_variant_get on a missing
    path yields NULL (checked).  The oracle runs the same paths with
    DuckDB's JSON extraction."""
    o = load_table(spark, sf_dir, "orders")
    doc = F.concat(
        F.lit('{"status":"'), F.col("o_orderstatus"), F.lit('","price":'),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.lit(',"nums":[3,7,11]}'))
    v = o.select("o_orderkey", F.parse_json(doc).alias("v"))
    return v.select(
        "o_orderkey",
        F.variant_get(F.col("v"), "$.status", "string").alias("status"),
        F.variant_get(F.col("v"), "$.price", "double").alias("price"),
        F.variant_get(F.col("v"), "$.nums[2]", "int").alias("third_num"),
        F.try_variant_get(F.col("v"), "$.missing", "string").isNull()
        .alias("miss"))


@q("agg_grouping_sets", """
SELECT CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())""")
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the custom-combination form next to the
    CUBE and ROLLUP entries — a CUBE would also emit the
    (priority)-only layer this report does NOT want): three chosen
    layers in ONE pass — Spark plans a single Expand below one
    partial hash-agg, so map-side combine stays intact and the fact
    is read once, not once per layer.  Money in exact int64 cents."""
    ev = load_table(spark, sf_dir, "orders")
    ev.createOrReplaceTempView("__gsets_orders")
    return spark.sql("""
        SELECT CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM __gsets_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())""")


@q("quality_completeness_profile", """
SELECT 'c_name' AS col,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(SUM(CASE WHEN trim(COALESCE(c_name, '')) = ''
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_blank
FROM customer
UNION ALL
SELECT 'c_mktsegment',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN trim(COALESCE(c_mktsegment, '')) = ''
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM customer
UNION ALL
SELECT 'c_acctbal',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(0 AS BIGINT)
FROM customer""")
def quality_completeness_profile(spark, sf_dir):
    """Deequ-style completeness profile (null + blank rates per
    column) in ONE scan — the unpivot trick catalog_analyze_columns
    uses for NDV, here for completeness: per-column indicator sums
    ride a single aggregation instead of one scan per column (the
    naive loop is C scans of a 100 TB table).  The oracle spells the
    same sums column by column."""
    c = load_table(spark, sf_dir, "customer")
    # one scan, one aggregate row carrying all the sums, then a
    # 1-row → 3-row driver-free reshape via stack
    a = c.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0))
        .cast("long").alias("null_name"),
        F.sum(F.when(F.trim(F.coalesce(F.col("c_name"), F.lit(""))) == "",
                     1).otherwise(0)).cast("long").alias("blank_name"),
        F.sum(F.when(F.col("c_mktsegment").isNull(), 1).otherwise(0))
        .cast("long").alias("null_seg"),
        F.sum(F.when(F.trim(F.coalesce(F.col("c_mktsegment"), F.lit("")))
                     == "", 1).otherwise(0)).cast("long")
        .alias("blank_seg"),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0))
        .cast("long").alias("null_bal"))
    return a.selectExpr("""stack(3,
        'c_name', n, null_name, blank_name,
        'c_mktsegment', n, null_seg, blank_seg,
        'c_acctbal', n, null_bal, CAST(0 AS BIGINT))
        AS (col, n, n_null, n_blank)""")


@q("src_fixed_width_ingest", """
SELECT o_orderkey,
       o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       o_orderpriority
FROM orders WHERE o_orderkey % 25 = 0""")
def src_fixed_width_ingest(spark, sf_dir):
    """Fixed-width (COBOL-extract style) file ingestion — the bank
    batch format the reference's CSV jobs eventually meet: write a
    deterministic fixed-width rendering of an orders slice (key 12 |
    status 1 | price 16 zero-padded decimal | priority 15), read it
    back with ``spark.read.text`` + pure substring/trim/cast
    projections — ALL whole-stage-codegen expressions, no UDF, and
    the text source splits by line so the parse parallelizes like any
    scan.  Price goes through DECIMAL(18,2) text both ways, so the
    roundtrip is exact; the oracle recomputes the slice from orders."""
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 25 == 0))
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.col("o_orderstatus"),
        F.lpad(F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
               16, "0"),
        F.rpad(F.col("o_orderpriority"), 15, " "))
    path = _scratch(sf_dir, "orders_fixed_width")
    o.select(line.alias("value")).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    return raw.select(
        F.substring("value", 1, 12).cast("long").alias("o_orderkey"),
        F.substring("value", 13, 1).alias("o_orderstatus"),
        F.substring("value", 14, 16).cast("decimal(18,2)")
        .cast("double").alias("price"),
        F.rtrim(F.substring("value", 30, 15)).alias("o_orderpriority"))


@q("src_csv_multiline_quoted", """
SELECT c_custkey, c_name || chr(10) || c_mktsegment AS note, c_acctbal
FROM customer WHERE c_custkey % 10 = 0""")
def src_csv_multiline_quoted(spark, sf_dir):
    """Quoted-newline CSV roundtrip (``multiLine=true``) — the reader
    behavior that separates a toy CSV parser from a real one: records
    whose quoted fields EMBED newlines span physical lines, so the
    reader must parse quote state across line boundaries.  (Scale
    note, documented trade-off: multiLine CSV files are not
    line-splittable — Spark reads each file whole, so the writer's
    partitioning sets the read parallelism; keep multiline extracts
    in many small files.)  The oracle recomputes the embedded-newline
    note from customer."""
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") % 10 == 0)
         .select("c_custkey",
                 F.concat(F.col("c_name"), F.lit("\n"),
                          F.col("c_mktsegment")).alias("note"),
                 "c_acctbal"))
    path = _scratch(sf_dir, "customer_multiline_csv")
    (c.repartition(4).write.mode("overwrite")
     .option("header", "true").option("quoteAll", "true").csv(path))
    return (spark.read.option("header", "true").option("multiLine", "true")
            .option("inferSchema", "false").csv(path)
            .select(F.col("c_custkey").cast("long").alias("c_custkey"),
                    F.col("note"),
                    F.col("c_acctbal").cast("double").alias("c_acctbal")))


@q("udf_cogroup_apply", """
WITH o AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey)
SELECT c.c_custkey,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(o.cents, 0) AS BIGINT) AS cents,
       c.c_acctbal
FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey""")
def udf_cogroup_apply(spark, sf_dir):
    """The COGROUP Python surface (§2.12's last uncovered shape):
    ``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas`` hands
    each key's rows from BOTH frames to one Arrow-batched pandas
    callable — the escape hatch for per-key merge logic SQL can't
    express (custom asof/interleave).  Here the callable computes a
    per-customer order rollup joined to the customer row, and the
    oracle is the equivalent LEFT JOIN + GROUP BY — proving the
    cogroup path exact (int64 cents, no float accumulation in
    Python).  Scale shape: ONE co-partitioned shuffle of both sides
    on the key (exactly what a join would shuffle), Arrow transfer,
    state bounded by one key's rows."""
    import pandas as pd

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"))

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:          # order rows for a custkey not in customer
            return pd.DataFrame(columns=["c_custkey", "n_orders",
                                         "cents", "c_acctbal"])
        return pd.DataFrame({
            "c_custkey": [int(left["c_custkey"].iloc[0])],
            "n_orders": [int(len(right))],
            "cents": [int(right["cents"].sum()) if len(right) else 0],
            "c_acctbal": [float(left["c_acctbal"].iloc[0])]})

    return (c.groupBy("c_custkey").cogroup(o.groupBy("o_custkey"))
            .applyInPandas(merge, "c_custkey long, n_orders long, "
                                  "cents long, c_acctbal double"))


@q("scalar_na_suite", """
WITH s AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END
           AS seg,
         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_acctbal END
           AS bal
  FROM customer)
SELECT c_custkey,
       COALESCE(seg, 'UNKNOWN') AS seg_filled,
       COALESCE(bal, 0.0) AS bal_filled,
       CASE WHEN COALESCE(seg, 'UNKNOWN') = 'BUILDING'
            THEN 'CONSTRUCTION' ELSE COALESCE(seg, 'UNKNOWN') END
         AS seg_replaced,
       (seg IS NOT NULL AND bal IS NOT NULL) AS complete
FROM s""")
def scalar_na_suite(spark, sf_dir):
    """The DataFrameNaFunctions surface (``df.na.fill`` / ``na.replace``)
    — the missing-data API layer over the COALESCE/CASE expressions it
    compiles to (planted NULLs on %7/%11 keys so both branches carry
    rows): typed per-column fills in one pass, a value-level replace,
    and a row-completeness flag.  Everything stays a map-only
    projection; the oracle writes the compiled-to expressions
    directly."""
    c = load_table(spark, sf_dir, "customer")
    s = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_mktsegment")).alias("seg"),
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_acctbal")).alias("bal"))
    complete = (F.col("seg").isNotNull()
                & F.col("bal").isNotNull()).alias("complete")
    s = s.select("*", complete)
    # fill, then replace on a COPY of the filled column — both na.*
    # surfaces exercised with zero joins (the whole entry stays one
    # map-only projection; a self-join here would be pure waste at
    # any scale)
    filled = (s.na.fill({"seg": "UNKNOWN", "bal": 0.0})
              .withColumn("seg_replaced", F.col("seg")))
    replaced = filled.na.replace("BUILDING", "CONSTRUCTION",
                                 subset=["seg_replaced"])
    return replaced.select(
        "c_custkey", F.col("seg").alias("seg_filled"),
        F.col("bal").alias("bal_filled"), "seg_replaced", "complete")


@q("scalar_map_suite", """
WITH t AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                  ORDER BY event_type) AS type_counts,
       string_agg(CASE WHEN n >= 3
                       THEN event_type || ':' || CAST(n * 10 AS VARCHAR)
                  END, ',' ORDER BY event_type) AS hot_scaled,
       CAST(MAX(n) AS BIGINT) AS max_n
FROM t GROUP BY user_id""")
def scalar_map_suite(spark, sf_dir):
    """MAP higher-order functions (§2.8 completion next to the array
    HOF suite): per-user event-type counts built into a real
    ``map<string,bigint>`` with ``map_from_entries``, then
    ``map_filter`` (keep hot types), ``transform_values`` (scale),
    ``map_entries`` + sort + serialize (the driver canon cannot hash
    maps, so entries render as ordered ``k:v`` strings — empty maps
    as NULL to match SQL's empty string_agg), and ``array_max`` over
    ``map_values``.  All lambdas JVM-side; one shuffle for the
    (user, type) agg, one for the per-user map build."""
    ev = load_table(spark, sf_dir, "events")
    t = (ev.groupBy("user_id", "event_type")
         .agg(F.count(F.lit(1)).alias("n")))
    m = (t.groupBy("user_id")
         .agg(F.map_from_entries(
             F.array_sort(F.collect_list(F.struct("event_type", "n"))))
             .alias("mp")))

    def render(mp):
        ent = F.array_sort(F.map_entries(mp))
        joined = F.array_join(
            F.transform(ent, lambda e: F.concat(
                e["key"], F.lit(":"), e["value"].cast("string"))), ",")
        return F.when(F.size(F.map_entries(mp)) == 0, F.lit(None)) \
            .otherwise(joined)

    hot = F.transform_values(
        F.map_filter(F.col("mp"), lambda k, v: v >= 3),
        lambda k, v: v * 10)
    return m.select(
        "user_id",
        render(F.col("mp")).alias("type_counts"),
        render(hot).alias("hot_scaled"),
        F.array_max(F.map_values("mp")).cast("long").alias("max_n"))


@q("join_lateral_topk", """
SELECT c.c_custkey, c.c_name, l.o_orderkey, l.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l""")
def join_lateral_topk(spark, sf_dir):
    """Correlated LATERAL join (the Spark 4 ``DataFrame.lateralJoin``
    API): top-2 orders per customer written as a per-row correlated
    subquery with ORDER BY + LIMIT.  The scale story is the plan, not
    the API: Catalyst DECORRELATES it — the executed plan is
    WindowGroupLimit (partial top-k per key BEFORE the shuffle, final
    after) + one broadcast hash join, i.e. exactly the
    row_number()-filter rewrite a careful engineer would hand-write,
    never a per-customer nested loop.  Plan shape pinned in
    tests/test_modern_api.py; the oracle is DuckDB's native LATERAL."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    sub = (o.where(F.col("o_custkey") == F.col("c_custkey").outer())
           .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(2)
           .select("o_orderkey", "o_totalprice"))
    return c.lateralJoin(sub)


@q("scalar_exists_subqueries", """
SELECT c.c_custkey,
       (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)
        FROM orders WHERE o_custkey = c.c_custkey) AS total_spend_cents,
       EXISTS (SELECT 1 FROM orders
               WHERE o_custkey = c.c_custkey
                 AND o_totalprice > 300000) AS has_big
FROM customer c""")
def scalar_exists_subqueries(spark, sf_dir):
    """Correlated SCALAR and EXISTS subqueries through the Spark 4
    column-builder APIs (``DataFrame.scalar()`` / ``.exists()``) —
    the declarative form of per-row lookups.  Catalyst decorrelates
    both into aggregate-then-join (one hash-agg over orders + left
    joins), so the plan scales as two shuffles regardless of customer
    count — never a per-row probe.

    The money sum is emitted through the INTEGER-CENTS canon
    (``floor(x*100 + 0.5)`` summed as BIGINT — identical double
    arithmetic on both engines): the r12 bisection proved the driver
    environment's bitwise hash diverges on DECIMAL *values* (decimal
    and NULL-free-decimal probes red, bool and cents probes green,
    all four locally repr-identical vs DuckDB), so a DECIMAL(18,2)
    output column can never be driver-hash-safe regardless of engine
    agreement.  Customers with no orders surface NULL cents and FALSE
    exists on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    corr = F.col("c_custkey").outer()
    spend = (o.where(F.col("o_custkey") == corr)
             .select(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                           .cast("long")).cast("long").alias("s")))
    big = o.where((F.col("o_custkey") == corr)
                  & (F.col("o_totalprice") > 300000))
    return c.select("c_custkey",
                    spend.scalar().alias("total_spend_cents"),
                    big.exists().alias("has_big"))


@q("ops_transpose_metrics", """
WITH m AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_custs
  FROM orders GROUP BY o_orderstatus)
SELECT 'n_orders' AS key,
       MAX(CASE WHEN o_orderstatus = 'F' THEN n_orders END) AS F,
       MAX(CASE WHEN o_orderstatus = 'O' THEN n_orders END) AS O,
       MAX(CASE WHEN o_orderstatus = 'P' THEN n_orders END) AS P
FROM m
UNION ALL
SELECT 'n_custs',
       MAX(CASE WHEN o_orderstatus = 'F' THEN n_custs END),
       MAX(CASE WHEN o_orderstatus = 'O' THEN n_custs END),
       MAX(CASE WHEN o_orderstatus = 'P' THEN n_custs END)
FROM m""")
def ops_transpose_metrics(spark, sf_dir):
    """``DataFrame.transpose()`` (Spark 4) flipping a BOUNDED metrics
    frame — the profile-report reshape (metrics as rows, groups as
    columns).  Transpose derives column names from DATA (first
    column's values), so it is a driver-bounded operation by
    construction: legal only on frames already reduced to
    group-cardinality size (here 3 order statuses × 2 metrics from
    one hash-agg); the big-data reshape remains pivot/groupBy.  The
    oracle builds the transposed layout with conditional aggregation."""
    o = load_table(spark, sf_dir, "orders")
    m = (o.groupBy("o_orderstatus")
         .agg(F.count(F.lit(1)).cast("double").alias("n_orders"),
              F.countDistinct("o_custkey").cast("double").alias("n_custs"))
         .orderBy("o_orderstatus"))
    return m.transpose()


@q("arrow_native_quantized_norm", """
SELECT vec_id,
       CAST(list_sum(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                 * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)))
            AS BIGINT) AS q_norm2
FROM embeddings""")
def arrow_native_quantized_norm(spark, sf_dir):
    """``DataFrame.mapInArrow`` — the zero-copy Arrow-native batch
    path UNDER mapInPandas (no pandas materialization, no NaN→null
    masking, list columns stay Arrow buffers): per-vector squared
    norm over component values quantized to int64 with the
    floor(x·1000+0.5) canon, so the per-row sum is exact integer
    arithmetic on both engines (the k-means recipe).  The UDF slices
    the FixedSizeList/List child buffer directly into one numpy
    reshape+einsum per RecordBatch — columnar end to end, map-only,
    no shuffle."""
    from aws_etl_bank_spark.llm.arrowops import quantized_norms

    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_norms(emb, "embedding", "vec_id", scale=1000)


@q("scalar_try_suite", """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE floor(o_totalprice / (o_orderkey % 5) * 10000 + 0.5)
                 / 10000 END AS safe_ratio,
       CASE WHEN o_orderkey % 2 = 1 THEN NULL
            ELSE 9223372036854775807 END AS add_sat,
       CASE o_orderkey % 4 WHEN 0 THEN 0
            WHEN 1 THEN 4611686018427387904 ELSE NULL END AS mul_sat,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_orderkey END AS cast_back,
       CASE o_orderkey % 3
            WHEN 0 THEN string_split(o_orderpriority, '-')[1]
            WHEN 1 THEN string_split(o_orderpriority, '-')[2]
            ELSE NULL END AS prio_part
FROM orders""")
def scalar_try_suite(spark, sf_dir):
    """The ANSI error-safe ``try_*`` function family (§2.8 next to the
    na/map/HOF suites): try_divide (NULL on zero divisor), try_add /
    try_multiply (NULL on int64 overflow — exercised with literals at
    the saturation boundary), try_cast (NULL on a non-numeric string,
    the ingest-coercion workhorse), and try_element_at (NULL on an
    out-of-bounds index, where plain element_at raises; index 0 is a
    hard INVALID_INDEX_OF_ZERO error even under try_, pinned in tests).  The oracle
    states each expected value directly (CASE over the same key
    arithmetic), so a behavior change in any try_ fallback — e.g. an
    overflow wrapping instead of NULLing — breaks the hash.  Pure
    projection: map-only, whole-stage codegen, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.selectExpr(
        "o_orderkey",
        "floor(try_divide(CAST(o_totalprice AS DOUBLE),"
        "       CAST(o_orderkey % 5 AS DOUBLE)) * 10000 + 0.5) / 10000"
        " AS safe_ratio",
        "try_add(9223372036854775807, o_orderkey % 2) AS add_sat",
        "try_multiply(4611686018427387904, o_orderkey % 4) AS mul_sat",
        "try_cast(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus"
        "              ELSE CAST(o_orderkey AS STRING) END AS BIGINT)"
        " AS cast_back",
        "try_element_at(split(o_orderpriority, '-'),"
        "               1 + CAST(o_orderkey % 3 AS INT)) AS prio_part")


@q("agg_listagg_ordered", """
SELECT o_orderpriority,
       string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS status_seq,
       string_agg(DISTINCT o_orderstatus, ','
                  ORDER BY o_orderstatus) AS status_set,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_orderkey % 97 = 0
GROUP BY o_orderpriority""")
def agg_listagg_ordered(spark, sf_dir):
    """``listagg(...) WITHIN GROUP (ORDER BY ...)`` (Spark 4's ANSI
    ordered string aggregation, §2.4/§2.8) in both plain and DISTINCT
    forms against DuckDB's ``string_agg(... ORDER BY ...)``.  The
    WITHIN GROUP ordering makes the concatenation deterministic — the
    whole point of the surface vs. collect_list+array_join, whose
    order is partition-dependent.  Driven on a key-sampled subset
    (%97) so group strings stay KB-bounded at any SF: unbounded
    per-group concatenation is an anti-pattern at 100 TB — the scale
    form caps with slice(sort_array(collect_list(...)), 1, k)."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 97 = 0")
    o.createOrReplaceTempView("__listagg_src")
    return spark.sql("""
        SELECT o_orderpriority,
               listagg(o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderkey) AS status_seq,
               listagg(DISTINCT o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS status_set,
               COUNT(*) AS n
        FROM __listagg_src GROUP BY o_orderpriority""")


@q("agg_hll_sketch_bound", """
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
       TRUE AS est_ok
FROM orders""")
def agg_hll_sketch_bound(spark, sf_dir):
    """The BUILT-IN Apache DataSketches HLL surface (Spark 3.5+:
    hll_sketch_agg → hll_union_agg → hll_sketch_estimate) next to the
    from-scratch HLL in functions/scale.py: per-status sketches union
    into a global distinct-customer estimate.  HLL registers are
    max-per-bucket, so the estimate is a pure function of the value
    SET — deterministic under any partitioning — and DuckDB cannot
    reproduce the DataSketches estimator bit-for-bit, so the oracle
    checks the ACCURACY CONTRACT instead: at lgK=14 (σ≈0.8%) the
    estimate must sit within ±3% of the exact count, asserted as a
    hashed boolean next to the exact count itself.  Mergeability
    (union of per-group sketches == sketch of the union) is exactly
    what makes sketches the 100 TB path: partial aggregation
    map-side, constant-size state per group."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__hll_src")
    return spark.sql("""
        WITH s AS (SELECT o_orderstatus, hll_sketch_agg(o_custkey, 14) AS sk
                   FROM __hll_src GROUP BY o_orderstatus),
             e AS (SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est
                   FROM s),
             x AS (SELECT COUNT(DISTINCT o_custkey) AS n_exact
                   FROM __hll_src)
        SELECT CAST(x.n_exact AS BIGINT) AS n_exact,
               abs(CAST(e.est AS DOUBLE) / x.n_exact - 1.0) <= 0.03
                   AS est_ok
        FROM e, x""")


@q("agg_kll_quantile_bound", """
WITH x AS (
  SELECT quantile_cont(o_totalprice, 0.50) AS q50_exact,
         quantile_cont(o_totalprice, 0.95) AS q95_exact,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders)
SELECT n, TRUE AS q50_ok, TRUE AS q95_ok FROM x""")
def agg_kll_quantile_bound(spark, sf_dir):
    """The BUILT-IN Apache DataSketches KLL quantile sketch (Spark
    3.5+: kll_sketch_agg_double → kll_sketch_merge_double →
    kll_sketch_get_quantile_double) — the MERGEABLE quantile path that
    replaces a global sort at 100 TB: per-status sketches (map-side
    partials, O(k) state) merge into global p50/p95 estimates.  KLL's
    guarantee is on RANK, not value: at the default k=200 the rank
    error is ≤ ~1.65% (two-sided, 99% conf; Karnin-Lang-Liberty 2016),
    so the oracle checks the accuracy CONTRACT — the estimated
    quantile's exact rank must sit within ±2.5% of the target rank —
    as hashed booleans next to the row count.  Merge order is pinned
    by sorting the per-group sketches on the group key before the
    fold, so the final sketch bytes — and the booleans — are
    deterministic under any partitioning."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__kll_src")
    return spark.sql("""
        WITH s AS (SELECT o_orderstatus,
                          kll_sketch_agg_double(o_totalprice) AS sk
                   FROM __kll_src GROUP BY o_orderstatus),
             m AS (SELECT aggregate(
                            slice(sks, 2, size(sks) - 1),
                            element_at(sks, 1),
                            (acc, x) -> kll_sketch_merge_double(acc, x))
                          AS sk
                   -- sort by group key so the merge ORDER (and thus
                   -- the exact sketch bytes) is deterministic, not
                   -- collect_list arrival order
                   FROM (SELECT transform(
                           array_sort(collect_list(
                             struct(o_orderstatus, sk))),
                           p -> p.sk) AS sks
                         FROM s)),
             q AS (SELECT
                     kll_sketch_get_quantile_double(sk, 0.50) AS q50,
                     kll_sketch_get_quantile_double(sk, 0.95) AS q95
                   FROM m),
             r AS (SELECT
                     CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(CASE WHEN o_totalprice <= q.q50
                              THEN 1 ELSE 0 END) / COUNT(*) AS rank50,
                     SUM(CASE WHEN o_totalprice <= q.q95
                              THEN 1 ELSE 0 END) / COUNT(*) AS rank95
                   FROM __kll_src, q GROUP BY q.q50, q.q95)
        SELECT n,
               abs(rank50 - 0.50) <= 0.025 AS q50_ok,
               abs(rank95 - 0.95) <= 0.025 AS q95_ok
        FROM r""")


@q("sql_recursive_cte_walk", """
WITH RECURSIVE walk(vec_id, head, depth) AS (
  SELECT vec_id, vec_id AS head, 0 AS depth
  FROM embeddings WHERE vec_id % 100 = 0
  UNION ALL
  SELECT e.vec_id, w.head, w.depth + 1
  FROM walk w JOIN embeddings e ON e.vec_id = w.vec_id + 1
  WHERE w.depth < 40)
SELECT CAST(head AS BIGINT) AS head,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(MAX(depth) AS INT) AS max_depth
FROM walk GROUP BY head""")
def sql_recursive_cte_walk(spark, sf_dir):
    """``WITH RECURSIVE`` (new in this Spark 4 build — probed and
    adopted r11): a bounded successor-chain walk from every 100th
    vec_id, UNION ALL recursion with a per-step equi-join and an
    explicit depth < 40 guard (the engine's recursion-level limit
    defaults to 100; unbounded linear recursion is the wrong tool on
    a cluster anyway — diameter-scale traversals belong to the
    pointer-doubling / star-contraction entries, which this entry's
    docstring exists to contrast).  Output is per-head reach counts,
    identical recursion semantics on DuckDB's native recursive CTE."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    emb.createOrReplaceTempView("__rcte_emb")
    return spark.sql("""
        WITH RECURSIVE walk(vec_id, head, depth) AS (
          SELECT vec_id, vec_id AS head, 0 AS depth
          FROM __rcte_emb WHERE vec_id % 100 = 0
          UNION ALL
          SELECT e.vec_id, w.head, w.depth + 1
          FROM walk w JOIN __rcte_emb e ON e.vec_id = w.vec_id + 1
          WHERE w.depth < 40)
        SELECT CAST(head AS BIGINT) AS head,
               COUNT(*) AS n_reached,
               CAST(MAX(depth) AS INT) AS max_depth
        FROM walk GROUP BY head""")


@q("udtf_table_argument_agg", """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders GROUP BY o_orderstatus""")
def udtf_table_argument_agg(spark, sf_dir):
    """Python UDTF with a TABLE argument + PARTITION BY (the Spark 4
    polymorphic table function surface, next to the lateral-view UDTF
    udtf_sentence_split): each o_orderstatus partition streams through
    one UDTF instance (eval per row, terminate yields the partition
    aggregate), Arrow-batched.  Money is folded as exact integer cents
    (floor(p·100+0.5)) so the Python accumulation matches the SQL
    oracle bit-for-bit.  Scale shape: PARTITION BY is one shuffle with
    |groups| parallelism — legal here (3 statuses × bounded state);
    the general high-cardinality aggregate stays groupBy/agg."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderstatus string, n bigint, total_cents bigint")
    class StatusAgg:
        def __init__(self):
            self.key = None
            self.n = 0
            self.cents = 0

        def eval(self, row):
            import math
            self.key = row["o_orderstatus"]
            self.n += 1
            self.cents += int(math.floor(row["o_totalprice"] * 100 + 0.5))

        def terminate(self):
            if self.n:
                yield self.key, self.n, self.cents

    spark.udtf.register("__status_agg", StatusAgg)
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__udtf_orders")
    return spark.sql("""
        SELECT * FROM __status_agg(
          TABLE(SELECT o_orderstatus, o_totalprice FROM __udtf_orders)
          PARTITION BY o_orderstatus)""")


@q("agg_theta_sketch_setops", """
WITH a AS (SELECT DISTINCT o_custkey % 2000 AS v FROM orders
           WHERE o_orderstatus = 'F'),
     b AS (SELECT DISTINCT o_custkey % 2000 AS v FROM orders
           WHERE o_orderstatus = 'O')
SELECT CAST((SELECT COUNT(*) FROM (SELECT v FROM a UNION SELECT v FROM b))
            AS BIGINT) AS n_union,
       CAST((SELECT COUNT(*) FROM (SELECT v FROM a INTERSECT
                                   SELECT v FROM b)) AS BIGINT) AS n_inter,
       CAST((SELECT COUNT(*) FROM (SELECT v FROM a EXCEPT
                                   SELECT v FROM b)) AS BIGINT) AS n_diff""")
def agg_theta_sketch_setops(spark, sf_dir):
    """Apache DataSketches THETA sketches — the sketch family that
    supports full SET ALGEBRA (union / intersection / A-not-B), i.e.
    audience-overlap analytics without ever materializing the sets:
    per-status customer-id sketches combine with theta_union /
    theta_intersection / theta_difference.  The value domain is
    projected to % 2000 so both sketches stay in EXACT mode (< k=4096
    retained hashes) — estimates are then exact integers and the
    oracle is plain distinct set algebra; above k the same plan
    degrades gracefully to ±1.6% estimates at CONSTANT memory, which
    is the 100 TB story (set intersection of two 10-billion-row
    audiences in two sketch scans + a driver-side combine)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__theta_src")
    return spark.sql("""
        WITH a AS (SELECT theta_sketch_agg(o_custkey % 2000) AS sk
                   FROM __theta_src WHERE o_orderstatus = 'F'),
             b AS (SELECT theta_sketch_agg(o_custkey % 2000) AS sk
                   FROM __theta_src WHERE o_orderstatus = 'O')
        SELECT CAST(theta_sketch_estimate(theta_union(a.sk, b.sk))
                    AS BIGINT) AS n_union,
               CAST(theta_sketch_estimate(theta_intersection(a.sk, b.sk))
                    AS BIGINT) AS n_inter,
               CAST(theta_sketch_estimate(theta_difference(a.sk, b.sk))
                    AS BIGINT) AS n_diff
        FROM a, b""")


@q("agg_bitmap_distinct_exact", """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
FROM orders GROUP BY o_orderpriority""")
def agg_bitmap_distinct_exact(spark, sf_dir):
    """The built-in BITMAP aggregate surface (Spark 3.5:
    bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg
    / bitmap_count) doing EXACT distinct counts as two cheap
    hash-aggs: keys bucket into fixed 32k-bit bitmap rows, per-bucket
    bitmaps OR together map-side, and the per-group distinct count is
    the SUM of per-bucket popcounts — the roaring-bitmap pattern next
    to functions/scale.py's custom bitmap retention entry.  Exact at
    every scale (no estimate), shuffle volume = populated buckets ×
    4 KiB, never the raw key stream."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__bm_src")
    return spark.sql("""
        WITH per_bucket AS (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bk,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
          FROM __bm_src GROUP BY o_orderpriority, bk)
        SELECT o_orderpriority,
               SUM(bitmap_count(bm)) AS n_cust
        FROM per_bucket GROUP BY o_orderpriority""")


@q("agg_regr_family", """
WITH t AS (SELECT o_orderkey % 1000 AS x,
                  2 * (o_orderkey % 1000) + (o_orderkey % 7) AS y
           FROM orders)
SELECT ROUND(regr_slope(y, x), 6) + 0 AS slope,
       ROUND(regr_intercept(y, x), 6) + 0 AS intercept,
       ROUND(regr_r2(y, x), 6) + 0 AS r2,
       CAST(regr_count(y, x) AS BIGINT) AS n,
       ROUND(regr_avgx(y, x), 6) + 0 AS avgx,
       ROUND(regr_avgy(y, x), 6) + 0 AS avgy
FROM t""")
def agg_regr_family(spark, sf_dir):
    """ANSI linear-regression aggregates (regr_slope / intercept / r2
    / count / avgx / avgy) over integer-valued x,y derived from the
    order key (y = 2x + key%7 noise, so the fit is strong but not
    perfect and r² is a real fraction).  Integer inputs keep every
    raw sum exact in double; the final ratios differ between engines
    only in the last ulps (each engine's own streaming accumulation),
    absorbed by the ROUND(...,6)+0 canon — output-only, never a key
    (the standing libm/tie rule).  One combineable hash-agg, the
    sufficient-statistics shape that scales to any row count."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__regr_src")
    return spark.sql("""
        WITH t AS (SELECT o_orderkey % 1000 AS x,
                          2 * (o_orderkey % 1000) + (o_orderkey % 7) AS y
                   FROM __regr_src)
        SELECT ROUND(regr_slope(y, x), 6) + 0 AS slope,
               ROUND(regr_intercept(y, x), 6) + 0 AS intercept,
               ROUND(regr_r2(y, x), 6) + 0 AS r2,
               regr_count(y, x) AS n,
               ROUND(regr_avgx(y, x), 6) + 0 AS avgx,
               ROUND(regr_avgy(y, x), 6) + 0 AS avgy
        FROM t""")


@q("quality_mask_pii", """
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
           AS masked_default,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(c_name,
           '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', 'D', 'g'),
           '[^UlD]', '*', 'g') AS masked_custom
FROM customer""")
def quality_mask_pii(spark, sf_dir):
    """The ``mask()`` PII-redaction function (§2.8 / the governance
    surface next to quality_k_anonymity and l_diversity): default
    masking (upper→X, lower→x, digit→n, other kept) and fully-custom
    masking (U/l/D and '*' for separators).  The oracle rebuilds both
    maskings with regexp chains — character-class coverage, not just
    row counts, is hash-checked.  Pure projection, codegen, no
    shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "mask(c_name) AS masked_default",
        "mask(c_name, 'U', 'l', 'D', '*') AS masked_custom")


@q("scalar_xml_suite", """
SELECT o_orderkey,
       o_orderpriority AS xp_prio,
       o_orderkey AS xml_key,
       o_orderstatus AS xml_status,
       CAST(2 AS INT) AS n_children
FROM orders WHERE o_orderkey % 11 = 0""")
def scalar_xml_suite(spark, sf_dir):
    """XML scalar functions (§2.8, next to the JSON/VARIANT suites;
    the reference's getSource dispatch lists XML as an ingest format):
    documents are BUILT from row data (concat), then re-extracted
    with xpath_string, from_xml (schema'd struct), and xpath counting
    — the oracle is the identity on the original columns, so any
    parse/escape/extraction defect breaks the hash.  Key-sampled
    (%11) to keep the Python-free codegen path the dominant cost."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 11 = 0")
    o.createOrReplaceTempView("__xml_src")
    return spark.sql("""
        WITH x AS (
          SELECT o_orderkey,
                 concat('<o><k>', o_orderkey, '</k><p>', o_orderpriority,
                        '</p><s>', o_orderstatus, '</s></o>') AS doc
          FROM __xml_src)
        SELECT o_orderkey,
               xpath_string(doc, '/o/p') AS xp_prio,
               from_xml(doc, 'k BIGINT, p STRING, s STRING').k AS xml_key,
               from_xml(doc, 'k BIGINT, p STRING, s STRING').s
                   AS xml_status,
               CAST(size(xpath(doc, '/o/*[self::k or self::s]/text()'))
                    AS INT) AS n_children
        FROM x""")


@q("text_url_parse", """
SELECT o_orderkey,
       'h' || CAST(o_custkey % 50 AS VARCHAR) || '.example.com' AS host,
       '/p/' || CAST(o_orderkey AS VARCHAR) AS path,
       o_orderstatus AS q_status,
       o_orderpriority AS dec_roundtrip
FROM orders WHERE o_orderkey % 13 = 0""")
def text_url_parse(spark, sf_dir):
    """URL parsing/encoding (parse_url HOST/PATH/QUERY-key,
    url_encode/url_decode) — the domain-extraction step every
    web-corpus curation pipeline runs before per-host dedup and
    filtering.  URLs are BUILT from row data, re-parsed, and the
    encode→decode roundtrip re-surfaces the raw priority string, so
    the oracle is the identity on the constructing columns.
    Key-sampled; pure codegen projection."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 13 = 0")
    o.createOrReplaceTempView("__url_src")
    return spark.sql("""
        WITH u AS (
          SELECT o_orderkey, o_orderpriority,
                 concat('https://h', o_custkey % 50, '.example.com/p/',
                        o_orderkey, '?s=', o_orderstatus) AS url
          FROM __url_src)
        SELECT o_orderkey,
               parse_url(url, 'HOST') AS host,
               parse_url(url, 'PATH') AS path,
               parse_url(url, 'QUERY', 's') AS q_status,
               url_decode(url_encode(o_orderpriority)) AS dec_roundtrip
        FROM u""")


@q("scalar_digest_suite", """
SELECT c_custkey,
       sha256(c_name) AS sha_hex,
       to_base64(CAST(c_name AS BLOB)) AS b64,
       lower(hex(c_name)) AS hex_bytes,
       c_name AS b64_roundtrip
FROM customer""")
def scalar_digest_suite(spark, sf_dir):
    """Content-digest and binary-encoding functions (§2.8, the
    fingerprint primitives under every dedup/caching scheme): SHA-256
    (cross-engine-identical hex), base64/unbase64 (RFC 4648, asserted
    by the decode roundtrip), and hex byte dumps (case-normalized —
    Spark upper-cases, DuckDB's hex() differs).  md5→int64 is already
    the house join-hash canon (feature_hash_text); this pins the rest
    of the digest surface.  Pure codegen projection."""
    c = load_table(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "sha2(c_name, 256) AS sha_hex",
        "base64(c_name) AS b64",
        "lower(hex(c_name)) AS hex_bytes",
        "CAST(unbase64(base64(c_name)) AS STRING) AS b64_roundtrip")


@q("scalar_timezone_suite", """
WITH t AS (
  SELECT o_orderkey AS k,
         make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                        CAST(month(o_orderdate) AS BIGINT),
                        CAST(day(o_orderdate) AS BIGINT),
                        CAST(o_orderkey % 24 AS BIGINT),
                        CAST(o_orderkey % 60 AS BIGINT),
                        CAST(o_orderkey % 60 AS DOUBLE)) AS base
  FROM orders WHERE o_orderkey % 17 = 0)
SELECT k, base,
       base + INTERVAL '330 minutes' AS ist,
       base + INTERVAL '8 hours' AS utc_from_pst,
       CAST(epoch(base) AS BIGINT) AS epoch_s
FROM t""")
def scalar_timezone_suite(spark, sf_dir):
    """Timezone arithmetic with FIXED-OFFSET zones (make_timestamp,
    convert_timezone, to_utc_timestamp, unix epoch extraction) — the
    deterministic core of timestamp handling.  Fixed offsets
    ('+05:30', '-08:00') are deliberate: they are pure interval
    shifts both engines agree on byte-for-byte, whereas NAMED zones
    drag in tz-database vintage skew (Java tzdb vs ICU) that no canon
    can reconcile — exactly the distinction a cross-engine pipeline
    must respect.  Session timezone is pinned UTC (session.py), so
    NTZ↔instant casts are identity and the epoch check is pure
    integer math.  Key-sampled; map-only projection."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 17 = 0")
    o.createOrReplaceTempView("__tz_src")
    return spark.sql("""
        WITH t AS (
          SELECT o_orderkey AS k,
                 CAST(make_timestamp(year(o_orderdate), month(o_orderdate),
                                     day(o_orderdate), o_orderkey % 24,
                                     o_orderkey % 60,
                                     CAST(o_orderkey % 60 AS DECIMAL(8,6)))
                      AS TIMESTAMP_NTZ) AS base
          FROM __tz_src)
        SELECT k, base,
               convert_timezone('UTC', '+05:30', base) AS ist,
               CAST(to_utc_timestamp(base, '-08:00') AS TIMESTAMP_NTZ)
                   AS utc_from_pst,
               unix_seconds(CAST(base AS TIMESTAMP)) AS epoch_s
        FROM t""")


@q("scalar_posexplode_outer", """
WITH t AS (SELECT o_orderkey AS k, CAST(o_orderkey % 4 AS INT) AS n
           FROM orders WHERE o_orderkey % 7 = 0)
SELECT k,
       CASE WHEN n = 0 THEN NULL ELSE CAST(g.i - 1 AS INT) END AS pos,
       CASE WHEN n = 0 THEN NULL ELSE CAST(g.i AS INT) END AS v
FROM t LEFT JOIN LATERAL (SELECT unnest(range(1, n + 1)) AS i) AS g
       ON TRUE""")
def scalar_posexplode_outer(spark, sf_dir):
    """NULL-preserving generators (§2.8/§2.9): posexplode_outer emits
    a (NULL, NULL) row for an EMPTY array where plain posexplode
    silently drops the parent row — the row-count-preserving contract
    ETL joins rely on after array expansion.  Empty arrays come from
    the data (key % 4 == 0); the oracle reproduces outer semantics
    with a LEFT LATERAL unnest.  One generate, no shuffle."""
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 7 = 0")
    o.createOrReplaceTempView("__gen_src")
    return spark.sql("""
        SELECT o_orderkey AS k, pos, v
        FROM __gen_src
        LATERAL VIEW OUTER posexplode(
          CASE WHEN o_orderkey % 4 = 0 THEN array()
               ELSE sequence(1, CAST(o_orderkey % 4 AS INT)) END)
          AS pos, v""")


@q("src_warc_roundtrip", """
SELECT CAST(doc_id AS VARCHAR) AS record_id,
       'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR)
           AS target_uri,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)
           AS content_length,
       text AS payload
FROM documents WHERE doc_id < 400""")
def src_warc_roundtrip(spark, sf_dir):
    """WARC ingestion (sources/warc.py — ISO 28500 / the Common Crawl
    ``.warc.gz`` container, implemented from the public spec since no
    WARC library ships here): documents become per-record-gzipped
    WARC responses (one member per record, the range-fetchable
    layout), written one segment per partition, then read back
    through the binaryFile source and parsed by Content-Length
    framing (never delimiter scanning).  The oracle is the identity
    on the source rows — record ids, URIs, byte lengths, and full
    payload text must survive the container — so header parsing,
    member walking (zlib unused_data loop), and UTF-8 framing are all
    hash-checked.  Parallelism = segments on both sides, the shape
    real crawl processing uses."""
    from aws_etl_bank_spark.sources.warc import read_warc, write_warc

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 400)
            .select("doc_id",
                    F.concat(F.lit("https://corpus.example/doc/"),
                             F.col("doc_id").cast("string")).alias("uri"),
                    "text"))
    path = _scratch(sf_dir, "warc_roundtrip")
    write_warc(docs.repartition(4), path, "doc_id", "uri", "text")
    return read_warc(spark, path)


@q("sql_pipe_syntax_pricing", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) / 100.0
           AS revenue
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus""")
def sql_pipe_syntax_pricing(spark, sf_dir):
    """SQL pipe syntax (Spark 4's ``|>`` operator chain, SPARK-49555 —
    the linear FROM-first form of nested SQL): a pricing summary
    written as WHERE |> EXTEND |> AGGREGATE ... GROUP BY |> EXTEND.
    Pipe syntax is pure PARSER surface — each ``|>`` stage lowers to
    the same Catalyst operators as the nested form, so the plan (one
    scan with pushed filter, partial+final hash aggregate) and the
    100 TB posture are identical to tpch_q1's; the entry pins that the
    dialect itself round-trips the engine.  Money flows through the
    integer-cents canon (r12: DECIMAL output columns are never
    driver-hash-safe); the derived double is bigint/100.0, identical
    IEEE division on both engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("__pipe_lineitem")
    return spark.sql("""
        FROM __pipe_lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                             + 0.5) AS BIGINT) AS disc_cents
        |> AGGREGATE CAST(SUM(disc_cents) AS BIGINT) AS revenue_cents,
                     CAST(COUNT(*) AS BIGINT) AS n_rows
           GROUP BY l_returnflag, l_linestatus
        |> EXTEND CAST(revenue_cents AS DOUBLE) / 100.0 AS revenue""")


@q("agg_approx_top_k_merge", """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority""")
def agg_approx_top_k_merge(spark, sf_dir):
    """Built-in heavy-hitters sketch (Spark 4.1's Apache DataSketches
    frequent-items family) through its MERGEABLE three-phase path:
    approx_top_k_accumulate per order-status group (map-side partial,
    O(maxItemsTracked) state) -> approx_top_k_combine into one global
    sketch -> approx_top_k_estimate.  This is the 100 TB shape — a
    fixed-size sketch per partition merges associatively, never a
    global shuffle of raw values.  The accuracy contract here is
    EXACTNESS by capacity: maxItemsTracked=8 exceeds the 5 distinct
    priorities, and the DataSketches frequent-items guarantee is
    zero count error while nothing is evicted, so the estimate equals
    the exact histogram and every row hash-checks against the plain
    GROUP BY oracle (the KLL entry's contract style, applied to
    frequencies).  Emitting ALL tracked items (k = distinct count)
    makes tie order irrelevant under the order-insensitive compare."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__atk_src")
    return spark.sql("""
        WITH s AS (SELECT o_orderstatus,
                          approx_top_k_accumulate(o_orderpriority, 8) AS sk
                   FROM __atk_src GROUP BY o_orderstatus),
             m AS (SELECT approx_top_k_combine(sk, 8) AS sk FROM s),
             e AS (SELECT explode(approx_top_k_estimate(sk, 5)) AS p
                   FROM m)
        SELECT p.item AS priority, CAST(p.count AS BIGINT) AS n FROM e""")


@q("stream_state_reader", """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id""")
def stream_state_reader(spark, sf_dir):
    """The state DATA SOURCE (Spark 4's ``statestore`` batch format,
    SPARK-45511) — reading a Structured Streaming checkpoint's state
    store as a DataFrame, the ops surface every production streaming
    pipeline needs for state inspection, debugging, and migration.  A
    real streaming aggregation (per-user counts over the events feed,
    availableNow) commits RocksDB/HDFS-backed state; the entry then
    reads the checkpoint BACK via ``spark.read.format("statestore")``
    and flattens key/value structs to (user_id, n_events).  The state
    rows — not the sink — are what's hash-checked: they must equal the
    batch GROUP BY, pinning that checkpointed state is complete and
    readable offline.  Scale: the state read is partitioned by the
    store's shuffle partitions, O(keys) rows."""
    import time as _time

    from aws_etl_bank_spark.plans.registry_llm import _events_stream_dir
    from aws_etl_bank_spark.sources.testdata import events_stream

    stream = events_stream(spark, _events_stream_dir(sf_dir))
    counts = stream.groupBy("user_id").count()
    ck = _scratch(sf_dir, f"state_reader_ck_{int(_time.time() * 1000)}")
    name = f"state_reader_{int(_time.time() * 1000) % 10_000_000}"
    query = (counts.writeStream.format("memory").queryName(name)
             .outputMode("update").option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    state = spark.read.format("statestore").load(ck)
    return state.select(F.col("key.user_id").alias("user_id"),
                        F.col("value.count").cast("long").alias("n_events"))


@q("src_pyds_filter_pushdown", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 200000 AND o_orderstatus = 'F'
  AND o_orderkey >= 1000""")
def src_pyds_filter_pushdown(spark, sf_dir):
    """FILTER PUSHDOWN through the custom Python DataSource (Spark
    4.1's ``DataSourceReader.pushFilters``, sources/pyds.py): the
    string-equality and integer-range predicates are claimed by the
    connector, which (a) prunes whole ROW GROUPS from the plan using
    footer min/max statistics — the same skip native parquet scans
    get — and (b) applies the residual mask with Arrow compute inside
    the task.  The DOUBLE comparison (`o_totalprice > 200000`) is
    deliberately YIELDED BACK to Spark (ADVICE r13): Spark's NaN
    semantics (NaN = NaN true; NaN > every double) differ from IEEE
    pyarrow.compute, and Spark never re-evaluates claimed filters, so
    float-column comparisons are never claimable.  At 100 TB this is
    the difference between a connector that ships every row to Spark
    and one that reads only qualifying row groups.  Identity columns
    make the oracle a plain WHERE."""
    import os

    from aws_etl_bank_spark.sources.pyds import PyArrowParquetDataSource

    try:
        spark.dataSource.register(PyArrowParquetDataSource)
    except Exception:
        pass  # already registered in this session
    return (spark.read.format("pyarrow_parquet")
            .option("path", os.path.join(sf_dir, "orders.parquet"))
            .load()
            .filter("o_totalprice > 200000 AND o_orderstatus = 'F' "
                    "AND o_orderkey >= 1000")
            .select("o_orderkey", "o_custkey", "o_totalprice"))


@q("canary_driver_hash_types", """
SELECT status, sum_cents,
       CAST(SUM(sum_cents) OVER (ORDER BY status) AS BIGINT)
           AS run_cents,
       avg_price, n, first_order, first_year, is_common
FROM (
    SELECT o_orderstatus AS status,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / (100.0 * COUNT(*)) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_order,
           CAST(year(MIN(o_orderdate)) AS INTEGER) AS first_year,
           COUNT(*) > 100 AS is_common
    FROM orders
    GROUP BY o_orderstatus
)
ORDER BY status""")
def canary_driver_hash_types(spark, sf_dir):
    """DRIVER-ENVIRONMENT CANARY (VERDICT r13 task 2): a deliberately
    cheap 3-row aggregate emitting one column of every value class the
    driver's bitwise hash canon has to handle — STRING key,
    integer-CENTS money (the proven-safe canon from the r11-r13
    DECIMAL-divergence incident: the driver environment's pandas hash
    diverges from local on DECIMAL values, so money is summed as
    ``BIGINT`` cents), a DOUBLE, a BIGINT count, a TIMESTAMP min, a
    ``year()`` INTEGER, a BOOLEAN, and (since r15) a WINDOWED
    ``SUM(BIGINT)`` — the class behind the r14 red: DuckDB types a
    windowed integer sum HUGEINT unless outer-CAST, so this column
    keeps the cast pattern on permanent display and would read out any
    future driver drift on windowed sums.  The DOUBLE is derived from
    the exact integer-cents sum with a single IEEE division
    (``sum_cents / (100.0 * n)``) rather than ``ROUND(AVG(...))`` —
    AVG over doubles is accumulation-order dependent and ROUND near a
    .005 tie can flip bitwise between engines (ADVICE r14); the
    division form has one bit pattern everywhere.  This entry is
    pinned to slot 1 of the driver's 50-entry window every round: any
    NEW driver-side hash divergence (a pandas/pyarrow upgrade changing
    canonicalization of one of these types) shows up as one red canary
    with a known-good local baseline, instead of a mystery red in a
    load-bearing entry.  Sub-second at sf0.01."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cents = F.sum(F.round(F.col("o_totalprice") * 100)
                  .cast("bigint")).cast("bigint")
    agg = (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            cents.alias("sum_cents"),
            (cents.cast("double")
             / (F.lit(100.0) * F.count(F.lit(1)))).alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderdate").cast("timestamp").alias("first_order"),
            F.year(F.min("o_orderdate")).cast("int").alias("first_year"),
            (F.count(F.lit(1)) > 100).alias("is_common"),
        )
    )
    return (
        agg.withColumn(
            "run_cents",
            F.sum("sum_cents").over(Window.orderBy("status"))
            .cast("bigint"))
        .select("status", "sum_cents", "run_cents", "avg_price", "n",
                "first_order", "first_year", "is_common")
        .orderBy("status")
    )


@q("sql_scripting_while_loop", """
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE year(o_orderdate) BETWEEN 1995 AND 2001""")
def sql_scripting_while_loop(spark, sf_dir):
    """SQL SCRIPTING (Spark 4.1 ``BEGIN ... END`` blocks, probed and
    adopted r14): session variables (``DECLARE``/``SET``), a ``WHILE``
    loop, and scalar-subquery assignment — the procedural surface a
    migration from stored-procedure warehouses needs.  The script
    walks the order years 1995-2001, accumulating an exact
    integer-CENTS revenue total and an order count into BIGINT
    variables (cents, not doubles, so the per-iteration accumulation
    order can never diverge bitwise from the oracle's single SUM).
    Both accumulators update through ONE multi-assignment ``SET
    (cents, n) = (SELECT ...)`` per iteration — one filtered aggregate
    per year, 7 bounded scans total (two separate SETs would scan
    twice per year).  Honesty note on the plan: even so, the single
    GROUP BY is the recommended form at 100 TB; the entry exists to
    pin the SCRIPTING surface (control flow, variable state,
    multi-assignment, loop termination), not to recommend the shape.
    The oracle is the closed-form aggregate over the same year band."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__script_orders")
    return spark.sql("""
        BEGIN
          DECLARE y INT DEFAULT 1995;
          DECLARE cents BIGINT DEFAULT 0;
          DECLARE n BIGINT DEFAULT 0;
          WHILE y <= 2001 DO
            SET (cents, n) = (
                SELECT cents + COALESCE(SUM(CAST(ROUND(o_totalprice
                                                       * 100)
                                                 AS BIGINT)), 0),
                       n + COUNT(*)
                FROM __script_orders WHERE year(o_orderdate) = y);
            SET y = y + 1;
          END WHILE;
          SELECT n AS n_orders, cents AS total_cents;
        END""")


