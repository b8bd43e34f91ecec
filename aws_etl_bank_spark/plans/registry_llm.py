"""Registry part 2: LLM-data-pipeline operators (dedup, similarity, text,
multimodal) and streaming — each a first-class `queries()` entry.  Oracles
are provided where DuckDB can express the same computation; hash-family
ops (MinHash/SimHash/fingerprints) are rows-only by design.

Entry definitions live in three part modules (pure mechanical split,
r16, VERDICT r15 task 7 — the same contract as the r15 registry.py
split) imported here IN ORIGINAL LINE ORDER so REGISTRY's insertion
order is identical to the single-file layout.  The parts raise
ImportError if imported directly (_LOADING_PARTS tripwire below).
"""

from __future__ import annotations

from aws_etl_bank_spark.plans import registry as _registry_mod  # noqa: E402

_PART_MODULES = [
    "aws_etl_bank_spark.plans.registry_llm_corpus",
    "aws_etl_bank_spark.plans.registry_llm_stream",
    "aws_etl_bank_spark.plans.registry_llm_scale",
]
_registry_mod.reject_partial_parts(
    _PART_MODULES, sanctioned="aws_etl_bank_spark.plans.registry_llm")
_LOADING_PARTS = True
from aws_etl_bank_spark.plans import registry_llm_corpus  # noqa: E402,F401
from aws_etl_bank_spark.plans import registry_llm_stream  # noqa: E402,F401
from aws_etl_bank_spark.plans import registry_llm_scale  # noqa: E402,F401
_LOADING_PARTS = False
_registry_mod.check_parts_registered(
    _PART_MODULES, id(_registry_mod.REGISTRY),
    sanctioned="aws_etl_bank_spark.plans.registry_llm")

# terminal registration stamp (symmetry with the registry.py parts)
_REGISTERED_INTO = id(_registry_mod.REGISTRY)

# re-export for the lazy cross-module imports in registry_analytics /
# registry_sources_sketches (`from ...registry_llm import
# _events_stream_dir` inside entry bodies) and for the invariant-helper
# unit tests (the part modules reject direct import)
from aws_etl_bank_spark.plans.registry_llm_corpus import (  # noqa: E402,F401
    _ann_topk_invariants, _dedup_keep_invariants, _minhash_pair_invariants,
    _simhash_pair_invariants)
from aws_etl_bank_spark.plans.registry_llm_stream import (  # noqa: E402,F401
    _events_stream_dir, _semantic_pair_invariants)
