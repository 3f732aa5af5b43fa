"""Hot-key mitigation tests: stop_shingle_filter is the designated
100-TB defense against boilerplate shingles (a fragment shared by d
docs contributes O(d^2) candidate pairs to one reducer). Injected skew
must actually be capped, and genuine near-dup pairs must survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.dedup import (
    stop_shingle_filter,
)
from txf_continuous_data_pipeline_spark.queries.text import (
    _build_shingle_index,
    _pairs_from_index,
)

BOILER = (
    "this document is provided under the standard license terms and "
    "conditions of the example corporation all rights reserved"
)


def _docs(spark):
    """60 docs sharing a boilerplate header (the planted hot shingles),
    each with a unique tail; docs 0 and 1 additionally share a long
    genuine passage (the true near-dup pair)."""
    passage = (
        "the quarterly report shows revenue increased across every "
        "region with particularly strong growth in the northern market"
    )
    rows = []
    for i in range(60):
        tail = f"unique trailer {i} alpha{i} beta{i} gamma{i} delta{i}"
        body = f"{BOILER} {passage} {tail}" if i < 2 else f"{BOILER} {tail}"
        rows.append((i, "web", body))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stop_shingle_filter_caps_injected_skew(spark):
    inv = _build_shingle_index(_docs(spark)).localCheckpoint(eager=True)

    def candidate_pairs(index):
        a, b = index.alias("a"), index.alias("b")
        return (
            a.join(
                b,
                (F.col("a.source") == F.col("b.source"))
                & (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .distinct()
            .count()
        )

    # Unfiltered: every one of the C(60,2) pairs collides on boilerplate.
    assert candidate_pairs(inv) == 60 * 59 // 2
    # Capped at df<=10: the 60-doc boilerplate shingles are dropped, so
    # the candidate set collapses to pairs sharing RARE shingles - far
    # below d^2 (the point of the cap).
    filtered = stop_shingle_filter(inv, shingle_col="sh", max_doc_freq=10)
    n_filtered = candidate_pairs(filtered)
    assert n_filtered < 20, n_filtered
    # ... and the genuine near-dup pair (docs 0,1 share a rare passage)
    # still surfaces: the cap removes only non-discriminative shingles.
    kept_pairs = _pairs_from_index(filtered, 0.01)
    found = {(r.id_a, r.id_b) for r in kept_pairs.collect()}
    assert (0, 1) in found, found
