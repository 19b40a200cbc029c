"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as ent
from lambdo_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join("|".join(r) for r in rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name filter
    spark = get_spark(app_name="oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        g, e_ = canon(got), canon(exp)
        status = "OK  " if g == e_ else "FAIL"
        if g != e_:
            failures += 1
            print(f"{status}  {name}: spark={g[0]} rows cols={g[1]} h={g[2]}")
            print(f"      oracle={e_[0]} rows cols={e_[1]} h={e_[2]}")
            if g[0] == e_[0] and g[1] == e_[1]:
                a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
                b = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print("      first diffs:\n", a[bad].head(3), "\n  vs\n", b[bad].head(3))
        else:
            print(f"{status}  {name}: {g[0]} rows h={g[2]}")
    # entry smoke
    n = ent.entry(spark).count()
    print(f"entry() rows: {n}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
