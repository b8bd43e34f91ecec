"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, compares against its
``oracle_sql()`` in DuckDB: row count, column-name set, and an
order-insensitive value comparison (rows sorted, columns sorted by name,
values normalized).  Exit code 1 if anything mismatches.

Usage: python scripts/verify_entry.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import math
import sys
import datetime as dt

import duckdb

REPO = "/root/repo"
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_value(x)) for k, x in v.items()))
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(norm_value(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    from aws_etl_bank_spark.session import get_spark

    spark = get_spark("verify_entry")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {e}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append((name, f"columns {sorted(cols)} vs {sorted(ocols)}"))
            print(f"FAIL  {name}: column mismatch {sorted(cols)} vs {sorted(ocols)}")
            continue
        if len(rows) != len(orows):
            failures.append((name, f"rowcount {len(rows)} vs {len(orows)}"))
            print(f"FAIL  {name}: rowcount {len(rows)} vs {len(orows)}")
            continue
        a = rows_to_multiset(cols, rows)
        b = rows_to_multiset(ocols, orows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ, e.g. {diff}")
            continue
        passed += 1
        print(f"ok    {name}: {len(rows)} rows")

    print(f"\n{passed} passed, {rows_only} rows-only, {len(failures)} failed "
          f"of {len([n for n in qs if not name_filter or any(f in n for f in name_filter)])}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
