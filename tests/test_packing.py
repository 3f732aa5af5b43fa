"""Invariants for the training-set composition operators
(pack_sequences, mixture_sample) beyond the DuckDB parity check in
test_oracle_parity: structural properties a packed corpus must hold
regardless of data, and determinism under re-partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    mixture_sample,
    pack_sequences,
)
from txf_continuous_data_pipeline_spark.sources import read_table

SEQ = 64


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_pack_offsets_within_sequence(spark, sf_dir):
    out = pack_sequences(_docs(spark, sf_dir), seq_tokens=SEQ)
    bad = out.where(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= SEQ)
    ).count()
    assert bad == 0


def test_pack_stream_is_gapless_per_shard(spark, sf_dir):
    # Reconstruct each doc's start position (seq_index*SEQ + seq_offset):
    # within a shard, start positions must be exactly the running sum of
    # preceding token counts - no gaps, no overlaps.
    out = pack_sequences(_docs(spark, sf_dir), seq_tokens=SEQ)
    rows = out.orderBy("source", "doc_id").collect()
    pos = {}
    for r in rows:
        expect = pos.get(r["source"], 0)
        assert r["seq_index"] * SEQ + r["seq_offset"] == expect
        pos[r["source"]] = expect + r["n_tokens"]


def test_pack_spans_boundary_flag(spark, sf_dir):
    out = pack_sequences(_docs(spark, sf_dir), seq_tokens=SEQ)
    bad = out.where(
        F.col("spans_boundary")
        != (
            F.floor((F.col("seq_index") * SEQ + F.col("seq_offset")
                     + F.col("n_tokens") - 1) / SEQ)
            > F.col("seq_index")
        )
    ).count()
    assert bad == 0


def _mix(spark, sf_dir, df=None):
    docs = df if df is not None else _docs(spark, sf_dir)
    weight = F.when(
        F.substring(F.col("source"), 4, 10).cast("int") < 5, F.lit(2.0)
    ).otherwise(F.lit(1.0))
    return mixture_sample(docs, weight=weight, budget_tokens=1200)


def test_mixture_deterministic_under_repartition(spark, sf_dir):
    a = sorted(r["doc_id"] for r in _mix(spark, sf_dir).collect())
    b = sorted(
        r["doc_id"]
        for r in _mix(
            spark, sf_dir, _docs(spark, sf_dir).repartition(7)
        ).collect()
    )
    assert a == b and len(a) > 0


def test_mixture_upweighted_sources_get_higher_rate(spark, sf_dir):
    rates = {
        r["source"]: r["keep_rate"]
        for r in _mix(spark, sf_dir).select("source", "keep_rate")
        .distinct().collect()
    }
    up = [v for s, v in rates.items() if int(s[3:]) < 5]
    down = [v for s, v in rates.items() if int(s[3:]) >= 5]
    if up and down:
        assert min(up) > max(down) * 1.2  # 2x weight, similar sizes
