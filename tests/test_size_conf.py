"""_size_conf_bytes: the maxPartitionBytes parser behind the
read-parallelism floor gate (r14 verdict #6 / advice #1 - the pre-r15
parser turned '128m' into 128 BYTES, silently disabling the floor)."""

from __future__ import annotations

import pytest

from txf_continuous_data_pipeline_spark.operators.dedup import (
    _size_conf_bytes,
)


@pytest.mark.parametrize(
    "value,want",
    [
        ("134217728", 128 << 20),  # plain int (Spark's stored default)
        ("134217728b", 128 << 20),  # explicit bytes suffix
        ("128m", 128 << 20),
        ("128M", 128 << 20),
        ("128mb", 128 << 20),
        ("1g", 1 << 30),
        ("64k", 64 << 10),
        ("2t", 2 << 40),
        (" 256m ", 256 << 20),  # whitespace tolerated
    ],
)
def test_parses_spark_size_forms(value, want):
    assert _size_conf_bytes(value) == want


@pytest.mark.parametrize("value", ["", "abc", "12.5m", "m128", None])
def test_unparseable_falls_back_to_default(value):
    # fail-safe direction: the 128 MB default OVERESTIMATES splits
    # relative to any smaller configured size, so the gate never adds
    # a shuffle it should not
    assert _size_conf_bytes(value) == 128 << 20
    assert _size_conf_bytes(value, default=7) == 7
