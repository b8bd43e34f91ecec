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


# Slot policy (round 16, per the r15 verdict task 1): slot 1 is the
# PERMANENT driver-environment canary (r13 task 2) — one cheap 3-row
# aggregate emitting every value class the driver's bitwise hash has
# to handle, including the windowed-SUM(BIGINT) cents class behind
# r14's red.  Slots 2-5 are the four r15 rows-only→invariant
# conversions (text_fingerprint's functional contract, the three ANN
# shape-contract oracles) — their ORACLE SEMANTICS changed in r15, so
# the full local gate is the only evidence they have and a driver red
# here would invalidate the conversion pattern; the verdict puts them
# first.  Slots 6-14 are the nine r15-new surfaces that have never
# been driver-attested.  Slots 15-16 are the two entries whose oracles
# changed THIS round (r15 verdict task 4: the sf1 O(n²)-oracle
# carve-outs dedup_fuzzy_ed1_pairs / dedup_fuzzy_entity_ids now carry
# deletion-variant-blocked, pointer-doubling-closed oracles — and the
# pairs entry's output became a bucketed full-multiset checksum).
# Slots 17-50 advance the vintage waterline: the first 34 r8-vintage
# oracle-backed entries in registry order (oldest standing driver
# evidence is r8 after the r15 window cleared all of r7).  Rotation
# policy (r14 task 3): rows-only entries are EXCLUDED from the window
# (a slot spent on one reports err:"no_oracle" — wasted attestation);
# _registry() asserts this below.
_PRIORITY = [
    # slot 1: permanent canary
    "canary_driver_hash_types",
    # slots 2-5: r15 rows-only→invariant oracle conversions (verdict
    # r15 task 1 — re-attest FIRST, their oracle semantics changed)
    "text_fingerprint", "ann_ivf_topk", "ann_ivf_trained_topk",
    "ann_pq_topk",
    # slots 6-14: the nine r15-new surfaces, never driver-attested
    "win_ignore_nulls_family", "scalar_luhn_validation",
    "sql_cluster_by_ordered", "scalar_random_seeded_invariants",
    "variant_explode_lateral", "stream_state_store_read",
    "ops_toarrow_roundtrip", "agg_moments_family",
    "sketch_kll_quantile_band",
    # slots 15-16: oracles rewritten in r16 (sf1 exclusion retirement)
    "dedup_fuzzy_ed1_pairs", "dedup_fuzzy_entity_ids",
    # slots 17-50: first 34 r8-vintage oracle-backed entries, registry
    # order — advancing the oldest-evidence waterline past r8
    "agg_cube_grouping", "sketch_hll_distinct", "pivot_event_counts",
    "agg_percentiles", "scd2_as_of_read", "unpivot_melt",
    "scale_bucketed_join_agg", "win_rank_family_by_user",
    "sketch_quantile_binned", "sketch_kmv_jaccard", "join_salted_skew",
    "sessionize_gap_batch", "ts_anomaly_mad", "ts_cusum_drift",
    "quality_fk_orphans", "dedup_exact", "graph_connected_components",
    "dedup_ngram_keep_transitive", "dedup_ngram_jaccard",
    "dedup_embedding_pairs", "ann_bruteforce_topk", "text_stats_quality",
    "text_token_counts", "text_langid", "multimodal_meta",
    "multimodal_frames", "stream_sessionize", "llm_curation_pipeline",
    "text_chunking", "text_pii_scrub", "text_repetition",
    "stratified_sample_lang", "text_decontaminate", "token_budget_mix",
    # ---- 50-slot waterline: token_budget_mix is slot 50
    # r17 head: the remaining 15 r8-vintage entries, registry order
    # (join_asof_purchase, join_range_bands, dedup_lines_c4,
    #  dedup_substring_spans, text_bigram_logprob, text_tfidf_topterms,
    #  text_vocab_coverage, embed_quantize_int8,
    #  dedup_ngram_containment, mix_temperature_weights,
    #  embed_dim_variance, ann_lsh_planted_twin,
    #  text_decontaminate_bloom, stream_quantile_sketch,
    #  graph_degree_distribution), then the r9-vintage block
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
    # r14 verdict task 3: the driver window is attestation budget — a
    # rows-only entry in it burns a slot to report err:"no_oracle"
    # truthiness, not `is None`: oracle_sql() filters on `if
    # spec.oracle`, so an empty-string placeholder oracle would pass
    # an is-None guard yet still reach the driver as no_oracle
    rows_only = [name for name in _PRIORITY
                 if not full[name].oracle]
    if rows_only:
        raise ValueError(
            f"_PRIORITY lists rows-only entries: {rows_only}; the "
            "driver cannot adjudicate them — rotate their oracle-backed "
            "planted companions instead")
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
