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
    try:
        if v != v:  # NaN / NaT
            return None
    except (TypeError, ValueError):
        pass
    return v


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
    odf = con.sql(sql).df()
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    s_rows = _rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _rows(list(odf.columns), odf.itertuples(index=False, name=None))
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} != {len(o_rows)}"
    )
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        for c, (sv, ov) in zip(s_cols, zip(sr, orow)):
            assert _vals_eq(sv, ov), (
                f"{name}: row {i} col {c}: spark={sv!r} oracle={ov!r}\n"
                f"  spark row:  {sr}\n  oracle row: {orow}"
            )
