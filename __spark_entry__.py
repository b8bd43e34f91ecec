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


# Slot policy (round 7, per the r6 verdict): clear the evidence debt.
# The driver evaluates the first 50 registry entries per round; r6 left
# 67 entries whose newest driver row is r3 or older, plus ann_pq_topk
# (never driver-run).  Order: (1) the schema tripwire, (2) the entries
# whose implementation or oracle CHANGED this round (canon-zero on the
# signed-delta/DSIR rounds, DECIMAL cube sums, the cached top-fraction,
# and the new SemDeDup recall-invariant companion), (3) ann_pq_topk,
# (4) 40 of the 67 stale r2/r3 entries in ledger order.  The remaining
# 27 stale entries complete in r8 — after which no entry's newest
# driver evidence predates r4.
_PRIORITY = [
    # environment-drift tripwire first: pinned-literal schema oracle makes
    # a testdata regeneration fail in ONE obvious row (TESTDATA.md)
    "testdata_schema_smoke",
    # changed this round — re-prove before anything else: -0.0
    # canonicalization on the two genuinely signed rounded outputs
    # (difference of float sums; log-likelihood ratios), exact-decimal
    # CUBE sums, the persisted three-pass top-fraction, and the new
    # planted found==co-cell recall oracle for semantic dedup
    "win_lag_delta", "llm_dsir_select", "agg_cube_type_day",
    "text_quality_top_fraction", "dedup_semantic_full_recall",
    # new this round: HyperLogLog mergeable distinct sketch (the CMS
    # sibling, both estimator regimes in one oracle row pair), and the
    # REAL image decode path (numpy P6 parser + nearest-neighbor
    # thumbnail vectors over planted closed-form PPM payloads)
    "sketch_hll_distinct", "multimodal_decode_ppm",
    "multimodal_thumbnail_vec",
    # the ONE entry with zero driver evidence of any kind (rows-only)
    "ann_pq_topk",
    # r2/r3-stale refresh, ledger order (40 slots; 27 remain for r8)
    "filter_python_predicate", "filter_drop_policy", "map_python_records",
    "map_error_policy", "drop_null_fields_op",
    "union_by_name_drift", "union_choice_cast", "resolve_choice_make_cols",
    "subtract_op", "intersect_op", "distinct_op", "orderby_topk",
    "sample_limit",
    "scalar_dates", "scalar_when_case", "scalar_strings", "udf_surface",
    "filter_sql_expr", "string_cleanup", "repartition_coalesce",
    "explode_split", "posexplode_index", "replace_array_element",
    "named_struct_op", "ingestion_time_columns",
    "csv_allstrings_cast", "unbox_json", "scd2_merge_dim", "unbox_csv",
    "unnest_struct", "unnest_ddb",
    "relationalize_root", "relationalize_child", "spigot_passthrough",
    "catalog_pushdown", "src_getsource_csv_getframe",
    "src_parquet_sink_catalog_roundtrip", "src_sample_frame_full",
    "todf_resolve_option_cast", "errors_as_dynamic_frame",
    # ---- 50-slot waterline (the driver caps here) ----
    # r8 rotation finishes the stale set from this point:
    "agg_cube_grouping", "pivot_event_counts",
    "agg_percentiles", "scd2_as_of_read", "unpivot_melt", "dedup_exact",
    "graph_connected_components", "dedup_ngram_keep_transitive",
    "dedup_ngram_jaccard", "dedup_embedding_pairs", "ann_bruteforce_topk",
    "text_stats_quality", "text_token_counts", "text_langid",
    "multimodal_meta", "multimodal_frames", "stream_sessionize",
    "llm_curation_pipeline", "text_chunking", "text_pii_scrub",
    "text_repetition", "stratified_sample_lang", "text_decontaminate",
    "token_budget_mix", "join_asof_purchase", "join_range_bands",
    "dedup_lines_c4",
    # rest of the 50-cap fills from registry definition order below
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
