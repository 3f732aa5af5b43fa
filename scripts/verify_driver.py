"""Replay the external driver's verification flow from a fresh process.

Loads /root/repo/__spark_entry__.py with importlib (like the driver),
smoke-checks entry(spark), then runs every queries()[name] at sf0.01
against oracle_sql()[name] on DuckDB: row-count + column-name-sorted,
row-sorted value compare (floats via math.isclose, NaN/NaT -> None).

Usage: python scripts/verify_driver.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

REPO = "/root/repo"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, REPO)
    spec.loader.exec_module(mod)
    return mod


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    try:  # pandas NaT / NaN-likes
        import pandas as pd

        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return v


def rows_key(rows):
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def values_match(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, (float, int)):
        return math.isclose(float(a), b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(name, spark_df, con, sql):
    cols = sorted(spark_df.columns)
    s_rows = [
        tuple(canon(r[c]) for c in cols) for r in spark_df.collect()
    ]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    if sorted(o_cols) != cols:
        return f"SCHEMA {sorted(o_cols)} != {cols}"
    idx = [o_cols.index(c) for c in cols]
    o_rows = [tuple(canon(r[i]) for i in idx) for r in o.fetchall()]
    if len(s_rows) != len(o_rows):
        return f"ROWCOUNT spark={len(s_rows)} oracle={len(o_rows)}"
    for sr, orow in zip(rows_key(s_rows), rows_key(o_rows)):
        for a, b in zip(sr, orow):
            if not values_match(a, b):
                return f"VALUE {a!r} != {b!r} in row {sr}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mod = load_entry()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("verify_driver")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    res = mod.entry(spark)
    n = len(res.collect())
    print(f"entry(): {n} rows, schema={[f.name for f in res.schema.fields]}")
    assert n > 0, "entry() returned no rows"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if name in oracles:
            err = compare(name, df, con, oracles[name])
            status = err or "OK"
        else:
            status = f"rows-only ({df.count()} rows)"
            err = None
        print(f"{name:40s} {status}  [{time.perf_counter() - t0:.1f}s]", flush=True)
        if err:
            failures.append((name, err))

    if failures:
        print(f"\nFAILED: {len(failures)}/{len(queries)}")
        sys.exit(1)
    print(f"\nALL OK: {len(queries)} queries ({len(oracles)} oracle-checked)")


if __name__ == "__main__":
    main()
