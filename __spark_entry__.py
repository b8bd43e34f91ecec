"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``aws_etl_bank_spark`` package; this
module only adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Slot policy (round 12, per the r11 verdict tasks 1 + 2 + 3 + 5):
# slots 1-10 are the round's new oracle-backed surfaces
# (transformWithState ValueState / ListState / paged-MapState /
# Row-based via the vendored from-scratch protobuf runtime; the
# applyInArrow / arrow_udf / Python-DataSource-writer batch; KLL
# quantile sketch; Python streaming source + sink).  Slots 11-15 are
# the round's only red row and its four bisection probes, i.e. its
# three bisection probes (r11 task 1 — decimal-only / boolean-only /
# integer-cents variants isolate which column the driver's bitwise
# hash rejects; all four verified green locally at sf0.01 the day
# they landed).  Slots 13-24 are the 12 late-r11 entries the driver
# has never evaluated (each builder-verified at sf0.01 + sf1 in r11
# and re-verified at r12 HEAD; src_warc_roundtrip's record_id became
# a string this round — ADVICE fix — and was re-verified after).
# Slots 25-30 are the deferred r4-vintage rows-only block (their
# oracle-backed planted companions are all driver-green).  Slots
# 34-50 are r5-vintage refreshes (17 of the 26 non-TPC-H r5 entries;
# the other nine lead the r13 queue ahead of the 20 TPC-H r5
# entries).
_PRIORITY = [
    # slots 1-4: NEW in r12 — transformWithState (ValueState /
    # ListState / paged-MapState / Row-based variant) unblocked by
    # the from-scratch vendored protobuf runtime (each verified
    # sf0.01 + sf1 the day it landed)
    "stream_tws_running_totals", "stream_tws_topk_list",
    "stream_tws_type_counts_map", "stream_tws_minmax_rows",
    # slots 5-7: NEW in r12 — the remaining Spark 4 Arrow-native
    # surfaces (applyInArrow grouped-map, arrow_udf scalars, Python
    # DataSource Arrow WRITER), each verified sf0.01 + sf1 on landing
    "arrow_grouped_apply", "arrow_udf_scalar",
    "src_python_datasource_writer",
    # slot 8: NEW in r12 — built-in DataSketches KLL quantile sketch
    # under a rank-error accuracy contract (verified sf0.01 + sf1)
    "agg_kll_quantile_bound",
    # slots 9-10: NEW in r12 — custom Python STREAMING DataSource,
    # both halves (Kinesis-shaped shard/offset reader; exactly-once
    # manifest-commit sink), each verified sf0.01 + sf1
    "stream_pyds_shard_source", "stream_pyds_manifest_sink",
    # slots 11-15: the r11 red row + its bisection probes (r11 task
    # 1; A' = the NULL-free decimal variant that splits the
    # NULL-decimal theory from the decimal-values theory in one round)
    "scalar_exists_subqueries", "scalar_exists_probe_decimal",
    "scalar_exists_probe_decimal_nonull",
    "scalar_exists_probe_bool", "scalar_exists_probe_cents",
    # slots 16-27: late-r11 entries, never driver-evaluated
    "agg_theta_sketch_setops", "agg_bitmap_distinct_exact",
    "agg_regr_family", "quality_mask_pii", "scalar_xml_suite",
    "text_url_parse", "scalar_digest_suite", "multimodal_decode_png",
    "scalar_timezone_suite", "scalar_posexplode_outer",
    "src_warc_roundtrip", "multimodal_decode_gif",
    # slots 28-33: the deferred r4-vintage rows-only block
    "text_fingerprint", "dedup_simhash_pairs", "dedup_minhash_pairs",
    "ann_ivf_topk", "ann_ivf_trained_topk", "dedup_minhash_keep",
    # slots 34-50: non-TPC-H r5-vintage refreshes (17 fit)
    "dedup_fuzzy_ed1_pairs", "dedup_fuzzy_entity_ids",
    "dedup_minhash_incremental", "fraud_benford_digits",
    "graph_pagerank", "grouped_map_normalize", "infer_embed_texts",
    "join_bloom_prefilter", "join_null_safe_equality",
    "loan_amortization_schedule", "maintenance_compact_roundtrip",
    "rfm_segmentation", "sample_limit_contained", "scalar_json_suite",
    "scalar_string_suite", "scale_skew_report",
    "scale_zorder_clustered_read",
    # ---- 50-slot waterline: scale_zorder_clustered_read is slot 50
    # r13 head: the nine dropped non-TPC-H r5 refreshes, then the 20
    # TPC-H r5-vintage refreshes in numeric order, then r6-vintage
    "src_jsonl_roundtrip", "src_orc_roundtrip",
    "stream_incremental_dedup",
    "text_hash_split", "text_pack_sequences", "text_unigram_logprob",
    "ts_rolling_zscore_bucketed", "ts_rollup_incremental_merge",
    "win_first_last_nth",
    "tpch_q1_pricing_summary", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_type_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity", "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_revenue", "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier", "tpch_q22_dormant_high_balance",
]


def _registry():
    import aws_etl_bank_spark.plans.registry as reg
    import aws_etl_bank_spark.plans.registry_llm  # noqa: F401  (populates REGISTRY)

    full = reg.REGISTRY
    ordered = {name: full[name] for name in _PRIORITY if name in full}
    ordered.update(full)
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship fact-snapshot query (SURVEY.md §3.1) on sf0.001."""
    from aws_etl_bank_spark.plans.flagship import build_fact_snapshot
    from aws_etl_bank_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return build_fact_snapshot(spark, "/root/testdata/sf0.001", fidelity=False)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _registry().items() if spec.oracle}
