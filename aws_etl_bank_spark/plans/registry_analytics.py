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

# Direct-import tripwire (ADVICE r15; shared body since r16) — see
# registry.require_part_loading.
from aws_etl_bank_spark.plans import registry as _registry_mod  # noqa: E402

_registry_mod.require_part_loading(__name__, _registry_mod, "_LOADING_PARTS")


# Entry definitions live in two subpart modules (pure mechanical
# split, r16, VERDICT r15 task 7) imported here IN ORIGINAL LINE
# ORDER so REGISTRY's insertion order is identical to the single-file
# layout.  _LOADING_SUBPARTS is the same direct-import tripwire the
# parent registry.py uses for this module.
_SUBPART_MODULES = [
    "aws_etl_bank_spark.plans.registry_analytics_core",
    "aws_etl_bank_spark.plans.registry_analytics_ext",
]
_registry_mod.reject_partial_parts(_SUBPART_MODULES)
_LOADING_SUBPARTS = True
from aws_etl_bank_spark.plans import registry_analytics_core  # noqa: E402,F401
from aws_etl_bank_spark.plans import registry_analytics_ext  # noqa: E402,F401
_LOADING_SUBPARTS = False
_registry_mod.check_parts_registered(_SUBPART_MODULES, id(REGISTRY))

# terminal registration stamp — see registry.check_parts_registered
_REGISTERED_INTO = id(REGISTRY)
