"""Differential test: every oracle-backed registry query must match
DuckDB at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from txf_continuous_data_pipeline_spark.queries import REGISTRY

from .oracle import compare, duck_connection

ORACLE_NAMES = sorted(n for n, (_, sql) in REGISTRY.items() if sql)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, sf_dir, con):
    fn, sql = REGISTRY[name]
    compare(fn(spark, sf_dir), con, sql, name)


def test_rows_only_queries_run(spark, sf_dir):
    for name, (fn, sql) in REGISTRY.items():
        if sql is None:
            assert fn(spark, sf_dir).count() >= 0, name


def test_approx_distinct_within_5pct_of_exact(spark, sf_dir):
    """The HLL++ sketch (rows-only forever) must track its exact twin:
    |approx - exact| / exact <= 0.05 per event_type (VERDICT r04 #4)."""
    exact = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["distinct_users"][0](spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["approx_distinct_users"][0](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.05, (et, approx[et], n)
