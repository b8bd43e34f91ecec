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
# r4-vintage ORACLE-BACKED entries; slot 37 the schema tripwire;
# slots 38-50 the first 13 r11-NEW entries (every one verified at
# BOTH sf0.01 and sf1 the day it landed).  The six r4-vintage
# rows-only entries yield their slots to new ORACLE-BACKED work and
# queue at the r12 head — each one's semantics are hash-covered by an
# oracle-backed planted companion already in-slate or green on the
# ledger (text_fingerprint_planted slot 31, ann_ivf_planted_twin,
# dedup_{minhash,simhash}_planted_{pairs,keep}).
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
    # slot 37: the schema tripwire
    "testdata_schema_smoke",
    # slots 38-50: r11-NEW entries in landing order (sf1-planted
    # fuzzy companions, the JPEG codec pair, the Spark 4 modern-API
    # batch, try_/listagg/HLL, recursive CTE, table-arg UDTF)
    "dedup_fuzzy_ed1_planted", "dedup_fuzzy_entity_planted",
    "multimodal_decode_jpeg", "multimodal_decode_jpeg420",
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
    "text_url_parse", "scalar_digest_suite", "multimodal_decode_png",
    "scalar_timezone_suite", "scalar_posexplode_outer",
    "src_warc_roundtrip", "multimodal_decode_gif",
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
