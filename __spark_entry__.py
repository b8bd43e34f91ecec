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


# Slot policy (round 14, per the r13 verdict tasks 1 + 2): slot 1 is
# the PERMANENT driver-environment canary — one cheap 3-row aggregate
# emitting every value class the driver's bitwise hash has to handle
# (string / integer-cents BIGINT / ROUND-double / count / timestamp /
# year-int / boolean), so any new driver-side canonicalization drift
# (the class that burned r11-r13 on DECIMAL) reads out as one red
# canary with a known-good local baseline instead of a mystery red in
# a load-bearing entry.  Slots 2-3 are the two entries whose semantics
# changed this round (sample_limit folded onto its invariant oracle,
# VERDICT r13 task 4; src_pyds_filter_pushdown after the float-column
# NaN yield-back, ADVICE r13 medium) — both need fresh driver
# attestation.  Slots 4-34 are the 31 remaining r6-vintage refreshes
# (registry order, continuing the written r13 queue); slots 35-50 the
# r7-vintage head.  After this round the oldest driver evidence is r7.
_PRIORITY = [
    # slot 1: permanent canary (VERDICT r13 task 2)
    "canary_driver_hash_types",
    # slots 2-3: semantics changed in r14 — re-attest
    "sample_limit", "src_pyds_filter_pushdown",
    # slots 4-11: NEW in r14 — SQL scripting (BEGIN/END, DECLARE/SET,
    # WHILE loop), conditional/boolean aggregates, EXECUTE IMMEDIATE,
    # IDENTIFIER + named parameters, GROUP BY ALL, TABLESAMPLE (ROWS)
    # under the invariant oracle, session variables, and the SQL PIVOT
    # clause.  (Round probes that did NOT become entries: recursive
    # CTE already covered r11; VARIANT shredded-write, Python
    # DataSource limit/agg pushdown absent from this build;
    # histogram_numeric merge-order-nondeterministic — PERF.md.)
    "sql_scripting_while_loop", "agg_conditional_bool_family",
    "sql_execute_immediate", "sql_identifier_params",
    "agg_group_by_all", "sample_tablesample_rows",
    "sql_session_variables", "sql_pivot_clause",
    # slots 12-15: NEW in r14 — polymorphic UDTF (analyze()-derived
    # schema), DISTRIBUTE BY / SORT BY partition-local ordering, the
    # named WINDOW clause (one shared sort pass), LIMIT..OFFSET
    # pagination (QUALIFY probed: not in this build's parser)
    "udtf_polymorphic_analyze", "sql_distribute_sort_by",
    "sql_named_window_clause", "sql_limit_offset_page",
    # slot 16: NEW in r14 — scripting control flow (FOR cursor, CASE
    # statement, IF, labeled REPEAT, EXIT HANDLER catching
    # raise_error; with ANSI off 1/0 is NULL, hence the explicit raise)
    "sql_scripting_control_flow",
    # slot 17: NEW in r14 — AES column-encryption family under a
    # roundtrip-identity oracle (GCM random-IV + deterministic ECB +
    # try_aes_decrypt wrong-key NULL)
    "scalar_crypto_roundtrip",
    # slot 18: NEW in r14 — Spark 4 collations (UTF8_LCASE grouping /
    # equality; lower(k) output for a deterministic representative,
    # CAST to plain string for the schema compare)
    "scalar_collation_group",
    # slot 19: NEW in r14 — bucket PRUNING on the read path
    # (SelectedBucketsCount 1-of-8, plan-pinned; autoBucketedScan off)
    "scale_bucket_pruned_read",
    # slot 20: NEW in r14 — pandas API on Spark roundtrip
    # (pandas_api() -> ps groupby/agg -> to_spark(); the reference's
    # vestigial pyspark.pandas import made deliberate)
    "ops_pandas_api_roundtrip",
    # slots 21-50: 30 of the 31 remaining r6-vintage refreshes (the
    # 31st, ann_ivfpq_planted_twin, heads the r15 queue)
    "split_rows_rest", "split_fields_op", "agg_rollup_nation_year",
    "sketch_count_min_estimates", "win_rank_family",
    "quality_metrics_orders", "quality_check_lineitem",
    "agg_approx_percentile_band", "src_xml_roundtrip",
    "ts_trend_slope", "scalar_datetime_suite", "ts_moving_median",
    "ts_ewma_smoothing", "tpch_q12_late_shipment_priority",
    "tpch_q16_supplier_counts_by_part", "dedup_semantic_pairs",
    "dedup_semantic_keep", "text_quality_top_fraction_by_lang",
    "scale_shuffle_key", "dedup_minhash_planted_pairs",
    "dedup_simhash_planted_pairs", "dedup_minhash_planted_keep",
    "text_bm25_rank", "text_bm25_topk", "stream_static_enrich",
    "dedup_semantic_pairs_full", "text_decontaminate_semantic",
    "ann_pq_planted_twin", "stream_cdc_scd2", "text_gopher_filter",
    # ---- 50-slot waterline: text_gopher_filter is slot 50
    # r15 head: the displaced last r6 refresh, then the r7-vintage
    # block in registry order
    "ann_ivfpq_planted_twin",
    "win_lag_delta",
    "filter_python_predicate", "filter_drop_policy",
    "map_python_records", "map_error_policy", "drop_null_fields_op",
    "union_by_name_drift", "union_choice_cast",
    "resolve_choice_make_cols", "subtract_op", "intersect_op",
    "distinct_op", "orderby_topk", "scalar_dates",
    "scalar_when_case", "scalar_strings", "udf_surface",
    "filter_sql_expr", "string_cleanup", "repartition_coalesce",
    "explode_split", "posexplode_index", "replace_array_element",
    "named_struct_op", "unnest_struct", "unnest_ddb", "unbox_json",
    "relationalize_root", "relationalize_child",
    "errors_as_dynamic_frame", "collection_select_map",
    "count_actions", "spigot_passthrough", "partitions_after_repartition",
]


def _registry():
    import aws_etl_bank_spark.plans.registry as reg
    import aws_etl_bank_spark.plans.registry_llm  # noqa: F401  (populates REGISTRY)

    full = reg.REGISTRY
    # a stale/typo'd slot name would otherwise vanish SILENTLY, shifting
    # every later entry up one slot and costing a round of driver
    # evidence unnoticed — the counterpart of the @q duplicate guard
    stale = [name for name in _PRIORITY if name not in full]
    if stale:
        raise ValueError(
            f"_PRIORITY names not in the registry: {stale}; fix the "
            "rotation queue before the driver evaluates a shifted window")
    if len(set(_PRIORITY)) != len(_PRIORITY):
        seen: set = set()
        dups = sorted({n for n in _PRIORITY
                       if n in seen or seen.add(n)})
        raise ValueError(
            f"_PRIORITY lists duplicated names: {dups}; the dict build "
            "would silently dedupe them and shift every later slot up "
            "one")
    ordered = {name: full[name] for name in _PRIORITY}
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
