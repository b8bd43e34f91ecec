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


# Entry definitions live in two subpart modules (pure mechanical
# split, r16, VERDICT r15 task 7) imported here IN ORIGINAL LINE
# ORDER so REGISTRY's insertion order is identical to the single-file
# layout.  _LOADING_SUBPARTS is the same direct-import tripwire the
# parent registry.py uses for this module.
_LOADING_SUBPARTS = True
from aws_etl_bank_spark.plans import registry_analytics_core  # noqa: E402,F401
from aws_etl_bank_spark.plans import registry_analytics_ext  # noqa: E402,F401
_LOADING_SUBPARTS = False
