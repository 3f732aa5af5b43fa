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


FLOAT_SAFE = 1 << 53  # largest contiguous exact integer in float64


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    import decimal

    if isinstance(v, decimal.Decimal):
        if v.is_nan():
            return None
        # Small Decimals keep the float path: isclose tolerance for
        # the rounded-quotient lanes AND aligned rows_key string sort
        # keys next to float columns (str(Decimal('3.140000')) would
        # sort away from str(3.14) and misalign row pairing). Past
        # 2^53 stay EXACT (the r12 lesson: coercing to float here hid
        # a driver-red checksum behind nine local "ALL OK" runs);
        # compare() separately hard-fails any wide Decimal, because
        # the external driver's hasher float-coerces asymmetrically
        # and is red even when both engines agree exactly.
        if abs(v) <= FLOAT_SAFE:
            return float(v)
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
        # datetime.date has no sep kwarg; normalize midnight datetimes
        # and bare dates to the same string so date32 vs timestamp
        # sources compare equal (both sides canonicalized identically).
        s = v.isoformat(sep=" ") if hasattr(v, "time") else v.isoformat()
        return s[:-9] if s.endswith(" 00:00:00") else s
    return v


def rows_key(rows):
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def values_match(a, b):
    import decimal

    if a is None or b is None:
        # guard BEFORE the Decimal branch: float(None) in the mixed
        # path would abort the whole verify run with a TypeError
        # instead of reporting the per-query VALUE mismatch
        return a is None and b is None
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        if isinstance(a, decimal.Decimal) and isinstance(b, decimal.Decimal):
            if a == b:
                return True
            # beyond float64's exact range, exact equality is the ONLY
            # acceptable outcome - isclose would paper over corruption
            if max(abs(a), abs(b)) > FLOAT_SAFE:
                return False
            return math.isclose(
                float(a), float(b), rel_tol=1e-9, abs_tol=1e-9
            )
        # mixed branch: one side Decimal, other arbitrary. A Decimal vs
        # string/date/bool divergence must surface as a per-query VALUE
        # mismatch, not abort the whole run on float()'s
        # TypeError/ValueError (the same crash class the None guard
        # above closed — ADVICE r13).
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if max(abs(fa), abs(fb)) > FLOAT_SAFE:
            return False
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, float) and isinstance(b, (float, int)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, (float, int)):
        return math.isclose(float(a), b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _canon_type(t) -> str:
    """Collapse an Arrow/Spark type to a comparison class. The driver
    hashes typed Arrow values, so DuckDB HUGEINT (decimal128) vs Spark
    long (int64) is a real mismatch even when Python values are equal -
    keep 'int' and 'decimal' distinct classes."""
    s = str(t).lower()
    if s.startswith(("timestamp", "datetime")):
        return "ts"
    if s.startswith("date"):
        return "date"
    if "string" in s or s in ("utf8", "large_utf8", "varchar"):
        return "str"
    if s.startswith(("int", "uint", "long", "short", "byte", "bigint")):
        return "int"
    if s.startswith(("float", "double", "halffloat")):
        return "float"
    if s.startswith("decimal"):
        # DuckDB DECIMAL/HUGEINT reach the driver as pandas float64, so
        # they match a Spark double but NOT a Spark long (the r01 bug).
        return "float"
    if s.startswith(("bool",)):
        return "bool"
    if s.startswith(("list", "array", "large_list")):
        return "list"
    return s


def wide_decimal_err(rows, side):
    """The external driver float-coerces Decimals on one side of its
    compare, so a >2^53 Decimal output is driver-red EVEN WHEN both
    engines agree exactly (price_quantile_sketch, r12). Flag it here so
    the class can never ship locally-green: emit hex strings or <2^53
    halves instead."""
    import decimal

    for row in rows:
        for v in row:
            if isinstance(v, decimal.Decimal) and abs(v) > FLOAT_SAFE:
                return (
                    f"WIDE-DECIMAL {side} value {v} exceeds 2^53; "
                    "driver hashing corrupts it - use a float-safe "
                    "representation"
                )
    return None


def compare(name, spark_df, con, sql):
    cols = sorted(spark_df.columns)
    s_rows = [
        tuple(canon(r[c]) for c in cols) for r in spark_df.collect()
    ]
    tbl = con.execute(sql).arrow()
    o_cols = list(tbl.column_names)
    if sorted(o_cols) != cols:
        return f"SCHEMA {sorted(o_cols)} != {cols}"
    s_types = {f.name: _canon_type(f.dataType) for f in spark_df.schema.fields}
    o_types = {fld.name: _canon_type(fld.type) for fld in tbl.schema}
    bad = [
        f"{c}: spark={s_types[c]} oracle={o_types[c]}"
        for c in cols
        if s_types[c] != o_types[c]
    ]
    if bad:
        return "TYPE " + "; ".join(bad)
    idx = [o_cols.index(c) for c in cols]
    o_rows = [
        tuple(canon(r[o_cols[i]]) for i in idx) for r in tbl.to_pylist()
    ]
    if len(s_rows) != len(o_rows):
        return f"ROWCOUNT spark={len(s_rows)} oracle={len(o_rows)}"
    err = wide_decimal_err(s_rows, "spark") or wide_decimal_err(
        o_rows, "oracle"
    )
    if err:
        return err
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
    # optional second arg: comma-separated query names to verify (a
    # targeted re-check after touching one family; the full run stays
    # the per-commit discipline)
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        unknown = only - set(queries)
        assert not unknown, f"unknown queries: {sorted(unknown)}"
        queries = {k: v for k, v in queries.items() if k in only}
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
