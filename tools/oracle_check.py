"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column-name schema,
and order-insensitive values. Exits non-zero on any mismatch.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from mapreduce_task_spark.session import get_spark  # noqa: E402
from mapreduce_task_spark.sources.tables import TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rowcount {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = all(
                (math.isnan(x) and math.isnan(y)) or x == y or abs(x - y) <= 1e-9 * max(1, abs(x), abs(y))
                for x, y in zip(av.astype(float), bv.astype(float))
            )
            exact = all(
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(av.astype(float), bv.astype(float))
            )
            if ok and not exact:
                print(f"    WARN col {c}: values equal only within 1e-9 (driver may hash-mismatch)")
            if not ok:
                bad = [(x, y) for x, y in zip(av, bv) if not (x == y or abs(x - y) <= 1e-9 * max(1, abs(x), abs(y)))][:3]
                return False, f"col {c} differs, e.g. {bad}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                diff = [(x, y) for x, y in zip(av.astype(str), bv.astype(str)) if x != y][:3]
                return False, f"col {c} differs, e.g. {diff}"
    return True, ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:400]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_pdf)} rows (no oracle)")
            if len(spark_pdf) == 0:
                print(f"    WARN {name}: zero rows")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:400]}")
            continue
        ok, why = _values_match(_canon(spark_pdf), _canon(duck_pdf))
        if ok:
            print(f"PASS {name}: {len(spark_pdf)} rows")
        else:
            failures.append(name)
            print(f"FAIL {name}: {why}")
    print(f"\n{len(qs) - len(failures)}/{len(qs) if not only else len(only)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
