"""MinHash/LSH recall pinned against exact Jaccard: with the fixed
hash seeds the approximate path is deterministic, so 'every true
near-dup pair is found' is a stable regression property, not a
probabilistic hope."""

from __future__ import annotations

from txf_continuous_data_pipeline_spark.operators.dedup import (
    minhash_neardup_pairs,
)
from txf_continuous_data_pipeline_spark.queries.text import (
    _jaccard_pair_frame,
)
from txf_continuous_data_pipeline_spark.sources import read_table


def test_minhash_finds_every_exact_pair(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_neardup_pairs(docs, threshold=0.5).collect()
    }
    # exact pairs are additionally source-blocked, so they are a subset
    # of what an unblocked sweep can see - recall must be total
    truth = {
        (r["id_a"], r["id_b"])
        for r in _jaccard_pair_frame(docs, 0.5).collect()
    }
    assert truth <= found, f"minhash missed {truth - found}"
    # and the verify stage guarantees precision: nothing below threshold
    low = minhash_neardup_pairs(docs, threshold=0.5).where(
        "jaccard < 0.5"
    )
    assert low.count() == 0
