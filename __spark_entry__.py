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


# Slot policy (round 8, per the r7 verdict): finish the evidence
# rotation.  The driver evaluates the first 50 registry entries per
# round; r7 cleared 40 of the 67 stale r2/r3 entries and left 27.
# Order: (1) the schema tripwire, (2) the two entries added after the
# r7 driver run (zero driver evidence), (3) entries whose
# implementation CHANGED this round (empty-sketch coalesce in
# hll_estimate; NULL-payload guards on every image-decode path),
# (4) the 10 entries NEW this round, (5) the final 27 stale r2/r3
# entries — after which no entry's newest driver evidence predates r4
# — and (6) the oldest r4-vintage rows begin their refresh cycle.
_PRIORITY = [
    # environment-drift tripwire first: pinned-literal schema oracle makes
    # a testdata regeneration fail in ONE obvious row (TESTDATA.md)
    "testdata_schema_smoke",
    # added after the r7 driver run — no driver row of any vintage yet
    "dedup_substring_spans", "text_bigram_logprob",
    # changed this round: hll_estimate coalesces the empty-sketch sum
    # (r7 advice).  The multimodal decode entries also changed, but
    # ONLY in a NULL-payload guard their planted fixtures (no NULLs)
    # cannot reach — they keep their r7-green rows and yield their
    # slots to the 19 brand-new entries below
    "sketch_hll_distinct",
    # new this round (19): the un-shadowed duplicate registrations, the
    # quantile/KMV sketches + their streaming rollup, the salted skew
    # join, the text/embedding curation ops, batch sessionization, the
    # MAD and CUSUM anomaly screens, the FK-orphan audit, containment
    # dedup, temperature mixing, dim-variance selection, the LSH ANN
    # planted twin, Bloom decontamination and the degree histogram
    "scale_bucketed_join_agg", "win_rank_family_by_user",
    "sketch_quantile_binned", "sketch_kmv_jaccard", "join_salted_skew",
    "text_tfidf_topterms", "text_vocab_coverage", "embed_quantize_int8",
    "sessionize_gap_batch", "ts_anomaly_mad",
    "ts_cusum_drift", "quality_fk_orphans", "dedup_ngram_containment",
    "mix_temperature_weights", "embed_dim_variance",
    "ann_lsh_planted_twin", "text_decontaminate_bloom",
    "stream_quantile_sketch", "graph_degree_distribution",
    # final r2/r3-stale refresh (27 entries, ledger order) — closes the
    # backlog the r6 verdict opened
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
    # ---- 50-slot waterline (the driver caps here) ----
    # r9 rotation: the r8 entries that landed after the slots filled
    # (every one builder-verified green vs DuckDB at sf0.001 + sf0.01 +
    # sf1 the day it landed — bench_out/VERIFY_full.json and the
    # sf1_*_r8 logs), then the two NULL-guard multimodal entries, then
    # the r4-vintage refresh begins:
    "sketch_hll_grouped", "stream_kmv_distinct", "sample_bottomk_hash",
    "ts_ohlc_bucket",
    "graph_triangle_count", "sample_weighted_priority", "ts_active_users_7d",
    "label_churn_window", "assoc_copurchase_lift", "ts_seasonal_strength",
    "feature_hash_text", "scale_heavy_hitters", "embed_pca_planted_axis",
    "feature_velocity_windows", "session_markov_transitions",
    "score_psi_drift", "sample_per_group_bottomk", "multimodal_decode_wav",
    "stream_heavy_hitters", "embed_jl_projection", "dedup_substring_remove",
    "feature_decayed_velocity", "quality_entropy_profile",
    "scale_bitmap_retention", "session_top_paths", "ann_ivf_index_persisted",
    "text_vocab_encode", "scd_snapshot_diff", "ts_lateness_profile",
    "ts_rollup_cascade", "text_word_pmi", "feature_impute_group",
    "feature_target_encode_loo", "sample_class_balanced",
    "split_temporal_purged", "ml_ols_closed_form", "stream_batch_unified", "agg_mode_per_group",
    "join_interval_overlap", "multimodal_audio_spectrum",
    "agg_weighted_median", "ts_autocorrelation", "graph_common_neighbors",
    "stream_ohlc_incremental", "csv_malformed_policy", "funnel_time_to_convert", "dedup_cluster_sizes",
    "agg_gini_concentration",
    "multimodal_decode_ppm", "multimodal_thumbnail_vec",
    "agg_daily_cust", "agg_payment_types", "agg_count_distinct",
    "agg_avg_by_month", "agg_nested_max", "agg_collect_struct_size",
    "count_actions",
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
