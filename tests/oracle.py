"""Mini replica of the driver's DuckDB-oracle differential check.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, sorts columns by name, sorts rows, and compares
values (floats to 1e-9 relative). Catching a divergence here at sf0.001
is the fast feedback loop for the driver's sf0.01 gate."""

from __future__ import annotations

import math
import os

import duckdb

from txf_continuous_data_pipeline_spark.sources.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(v):
    if v is None:
        return None
    # array columns: Spark's toPandas yields numpy arrays, DuckDB's
    # arrow yields python lists - canonize both to tuples so ordinary
    # equality applies element-wise
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    try:
        if v != v:  # NaN / NaT
            return None
    except (TypeError, ValueError):
        pass
    import decimal

    if isinstance(v, decimal.Decimal):
        # Arrow yields decimal.Decimal for DECIMAL columns. Up to 2^53
        # compare as float so the isclose tolerance applies (the
        # driver's pandas conversion sees float64 here). BEYOND 2^53 a
        # float cannot represent the value and the external driver's
        # asymmetric coercion corrupts it even when both engines agree
        # exactly (r12 price_quantile_sketch) - fail loudly so the
        # class can never ship locally-green again.
        if abs(v) > 1 << 53:
            raise AssertionError(
                f"wide Decimal output {v} exceeds 2^53: the external "
                "driver float-coerces one side of its compare and "
                "corrupts it - emit a float-safe representation "
                "(hex string or <2^53 halves)"
            )
        return float(v)
    # Normalize temporal types: pandas Timestamp vs datetime.date vs
    # datetime.datetime must compare equal when they name the same
    # instant (the driver hashes Arrow values, where both sides already
    # agree; locally pandas re-types them differently per source).
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    if hasattr(v, "isoformat"):
        s = v.isoformat(sep=" ") if hasattr(v, "time") else v.isoformat()
        return s[:-9] if s.endswith(" 00:00:00") else s
    return v


def _canon_type(t) -> str:
    """Collapse a Spark/Arrow type to a comparison class (mirrors
    scripts/verify_driver.py). The driver hashes typed Arrow values, so
    DuckDB HUGEINT (decimal128) vs Spark long (int64) is a real
    mismatch even when the Python values are equal."""
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
    if s.startswith("bool"):
        return "bool"
    if s.startswith(("list", "array", "large_list")):
        return "list"
    return s


def _rows(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _vals_eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    sdf = spark_df.toPandas()
    otbl = con.sql(sql).arrow()
    o_colnames = list(otbl.column_names)
    s_cols, o_cols = sorted(sdf.columns), sorted(o_colnames)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    s_types = {f.name: _canon_type(f.dataType) for f in spark_df.schema.fields}
    o_types = {fld.name: _canon_type(fld.type) for fld in otbl.schema}
    type_mismatch = [
        f"{c}: spark={s_types[c]} oracle={o_types[c]}"
        for c in s_cols
        if s_types[c] != o_types[c]
    ]
    assert not type_mismatch, f"{name}: TYPE {'; '.join(type_mismatch)}"
    s_rows = _rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _rows(
        o_colnames,
        [tuple(r[c] for c in o_colnames) for r in otbl.to_pylist()],
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} != {len(o_rows)}"
    )
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for c, (sv, ov) in zip(s_cols, zip(sr, orow)):
            assert _vals_eq(sv, ov), (
                f"{name}: row {i} col {c}: spark={sv!r} oracle={ov!r}\n"
                f"  spark row:  {sr}\n  oracle row: {orow}"
            )
