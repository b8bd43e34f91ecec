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


def weighted_cents_udaf():
    """Arrow-batched GROUPED-AGG pandas UDF (the Python UDAF surface —
    SURVEY.md §2.12 lists it as the upgrade path the reference never
    needed): Σ value·weight over exact int64 cents, one whole group per
    call.  Scale caveat BY CONSTRUCTION: a grouped-agg pandas UDF gets
    the ENTIRE group as one in-memory series (no partial aggregation,
    no map-side combine) — use it for bounded groups or genuinely
    non-decomposable aggregates; anything expressible as built-ins
    (this one is — its oracle uses SUM(v*w)) should stay JVM-side.
    int64 arithmetic keeps the result bit-equal to the SQL form
    regardless of pandas' summation order."""
    # pandas must be importable from MODULE globals: under
    # `from __future__ import annotations` the hint is the STRING
    # 'pd.Series' and pyspark resolves it against the function's
    # globals, not its closure
    global pd
    import pandas as pd

    @F.pandas_udf("long")
    def weighted_cents(v: "pd.Series", w: "pd.Series") -> int:
        return int((v * w).sum())

    # Spark refuses to mix a grouped-agg pandas UDF with JVM aggregates
    # in one groupBy (INVALID_PANDAS_UDF_PLACEMENT), so the companion
    # total is a pandas agg too
    @F.pandas_udf("long")
    def int_sum(w: "pd.Series") -> int:
        return int(w.sum())

    return weighted_cents, int_sum


def sentence_split_udtf():
    """Python UDTF (table function — the other §2.12 upgrade path):
    one text row in, one row PER SENTENCE out with its index and word
    count.  Runs Arrow-batched per partition like any generator; the
    lateral join keeps it distributed (no collect, no explode of a
    driver-built array).  Sentence convention: split on '.' + trailing
    whitespace, drop empties; words = whitespace split — both mirrored
    verbatim by the DuckDB oracle."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            pieces = [p for p in re.split(r"\.\s+", text) if p]
            for i, s in enumerate(pieces):
                yield i, s, len([w for w in s.split() if w])

    return SentenceSplit
