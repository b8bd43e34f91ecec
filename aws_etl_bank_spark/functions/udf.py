"""Python UDF surface: typed, default-string, and Arrow-batched pandas UDFs.

The reference registers row-at-a-time UDFs for its date-dim attributes
(glue-jobs/jobs/lekietvn/r2g_account.py:116-127), one of them untyped —
Spark then defaults the return type to string, and downstream SQL sees a
string column (SURVEY.md §8 fidelity quirk).  This module keeps that API
surface while steering real work to the fast paths:

- :func:`udf` — Glue-script-style registration; ``returnType`` defaults to
  ``StringType`` exactly like ``pyspark.sql.functions.udf``, preserving the
  untyped-returns-string behavior.
- :func:`typed_udf` — decorator form with an explicit return type.
- :func:`pandas_scalar_udf` — Arrow-batched scalar pandas UDF; the only
  sanctioned form anywhere the input is fact-sized (row-at-a-time Python
  UDFs serialize one row per call and are 10-100x slower).
- :func:`week_of_month_udf` — row-at-a-time parity twin of
  ``datedim.week_of_month_col``; kept ONLY for reference-parity tests on
  the 3.6k-row date dim, never on fact data.

Scale note: a Python UDF breaks whole-stage codegen and forces a
JVM→Python round trip per batch.  At 100 TB every UDF in this module is a
deliberate opt-in; the engine's built-in operators never call one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T


def udf(f=None, returnType=T.StringType()):
    """Glue-style UDF registration.  ``udf(lambda ...)`` with no return
    type yields a STRING column (the reference's untyped-UDF quirk);
    pass ``returnType`` for a typed UDF.  Usable as a decorator."""
    if f is None:
        return lambda g: udf(g, returnType)
    return F.udf(f, returnType)


def typed_udf(returnType):
    """Decorator: ``@typed_udf(T.IntegerType())``."""

    def deco(f):
        return F.udf(f, returnType)

    return deco


def pandas_scalar_udf(returnType):
    """Decorator for an Arrow-batched scalar pandas UDF
    (``pandas.Series -> pandas.Series``).  Prefer this over :func:`udf`
    for anything numeric or fact-sized."""

    def deco(f):
        return F.pandas_udf(returnType)(f)

    return deco


def week_of_month_udf():
    """Row-at-a-time week-of-month (reference r2g_account.py:116-118).
    Parity twin of the native ``week_of_month_col`` expression — use only
    on the date dim."""
    return F.udf(lambda d: ((d.day - 1) // 7 + 1) if d is not None else None,
                 T.IntegerType())
