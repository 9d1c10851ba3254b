"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir, compare row
count, schema (column names), and order-insensitive values.

Usage: python tools/check_driver_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import importlib
    entry_mod = importlib.import_module("__spark_entry__")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:400]}")
            continue
        # dtype-class check BEFORE canon: the driver's hasher is
        # dtype-sensitive (DuckDB HUGEINT -> float64 broke ft_termdict r1)
        for c in sorted(set(got.columns) & set(exp.columns)):
            gk = got[c].dtype.kind
            ek = exp[c].dtype.kind
            if {gk, ek} == {"i", "f"} or {gk, ek} == {"u", "f"}:
                failures.append(name)
                print(f"FAIL {name}: dtype-class mismatch on '{c}': spark {got[c].dtype} vs oracle {exp[c].dtype}")
                break
        if failures and failures[-1] == name:
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            continue
        if len(g) != len(e):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"ok   {name}: {len(g)} rows match ({dt:.1f}s)")
        except AssertionError as ex:
            failures.append(name)
            print(f"FAIL {name}: value mismatch: {str(ex)[:500]}")
            mism = (g != e).any(axis=1)
            print(g[mism].head(5))
            print(e[mism].head(5))
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
