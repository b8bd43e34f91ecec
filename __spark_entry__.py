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


# Slot policy (round 11, per the r10 verdict tasks 1 + 4): slots 1-3
# are the entries whose CODE changed this round (r10 ADVICE fixes —
# text_bpe_train_merges' boundary-aware re-segmentation,
# ops_table_reconcile_buckets' full-outer reconcile,
# score_ks_statistic's bucketed_cumsum contract; all re-verified at
# sf0.01 the day they changed).  Slots 4-23 are the remaining 20
# r10-new entries the driver has never evaluated (each
# builder-verified green via scripts/verify_entry.py in r10 AND
# re-verified at r11 HEAD).  Slots 24-36 are the 13 remaining
# r4-vintage ORACLE-BACKED entries, slots 37-43 the 7 r4-vintage
# rows-only entries — after this round no entry's newest driver
# evidence predates r5 (verdict task 4's "≤6 older than r6" met with
# room to spare).  Slots 44-50 hold the r11-NEW entries, inserted as
# they land.
_PRIORITY = [
    # slots 1-3: r10 ADVICE fixes (code changed this round)
    "text_bpe_train_merges", "ops_table_reconcile_buckets",
    "score_ks_statistic",
    # slots 4-23: the remaining 20 never-driver-evaluated r10 entries
    "ml_kmeans_lloyd", "graph_cc_star_chain",
    "quality_l_diversity", "scalar_hof_suite",
    "subtract_all_op", "intersect_all_op", "ops_observe_metrics",
    "catalog_equidepth_histogram",
    "ops_partition_file_stats", "src_avro_logical_types",
    "src_python_datasource", "udf_sql_scalar", "scalar_variant_suite",
    "agg_grouping_sets", "quality_completeness_profile",
    "src_fixed_width_ingest", "src_csv_multiline_quoted",
    "udf_cogroup_apply", "scalar_na_suite", "scalar_map_suite",
    # slots 24-36: last r4-vintage oracle-backed entries
    "stream_dedup_ids", "stream_foreach_batch", "stream_sample_poll",
    "stream_sliding_counts", "stream_stateful_counts", "stream_stream_join",
    "stream_window_counts", "text_fingerprint_planted", "ts_bucket_rollup",
    "ts_gapfill_hourly", "ts_rolling_zscore", "win_running_sum_acct",
    "win_running_sum_cust",
    # slots 37-42: last r4-vintage rows-only entries + schema tripwire
    # (text_fingerprint slips to r12 — its oracle-backed planted
    # companion text_fingerprint_planted is in slot 31, so the hard
    # signal refreshes; the rows-only row yields its slot to the new
    # oracle-backed scalar_try_suite)
    # (the r4 rows-only block slips to r12 — every one has an
    # oracle-backed planted companion carrying the hard signal;
    # ann_ivf_planted_twin is in slot 32 — keeping only the schema
    # tripwire in-slate)
    "testdata_schema_smoke",
    # slots 44-50: r11-NEW entries land here as they are built
    "dedup_fuzzy_ed1_planted", "dedup_fuzzy_entity_planted",
    "multimodal_decode_jpeg", "multimodal_decode_jpeg420",
    # slots 47-50: the Spark 4 modern-API batch (lateralJoin,
    # scalar()/exists(), transpose, mapInArrow)
    "join_lateral_topk", "scalar_exists_subqueries",
    "ops_transpose_metrics", "arrow_native_quantized_norm",
    "scalar_try_suite", "agg_listagg_ordered", "agg_hll_sketch_bound",
    "sql_recursive_cte_walk", "udtf_table_argument_agg",
    # ---- 50-slot waterline (the driver caps here) ----
    # r12 head: the late-r11 batch (builder-verified at sf0.01 + sf1,
    # never driver-evaluated), then the deferred r4 rows-only block,
    # then r5-vintage refreshes
    "agg_theta_sketch_setops", "agg_bitmap_distinct_exact",
    "agg_regr_family", "quality_mask_pii", "scalar_xml_suite",
    "text_fingerprint", "dedup_simhash_pairs", "dedup_minhash_pairs",
    "ann_ivf_topk", "ann_ivf_trained_topk", "dedup_minhash_keep",
    # r12 rotation resumes here: oldest-evidence r5-vintage entries
    # refresh next (fuzzy originals alongside their planted
    # companions, minhash_incremental, benford, pagerank, ...),
    # then definition order below
    "dedup_fuzzy_ed1_pairs", "dedup_fuzzy_entity_ids",
    "dedup_minhash_incremental", "fraud_benford_digits",
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
