"""Differential pin of the wordpiece_token_counts ORACLE on a planted
'#' corpus (r11 review wave 2): a merged plain form whose text reads
'##' previously classified as a zero-raw-length continuation piece,
whose empty-string match made the recursive greedy walk spin forever.
The fixed vocabl mirrors the operator's candidate construction (every
form matches at position 1 against its full text; only '##'-prefixed
forms with NONEMPTY raw also serve as continuations), so the oracle
must terminate AND value-match the operator on corpora the shipped
fixtures never exercise."""

from __future__ import annotations

import string

import duckdb
import pytest

from txf_continuous_data_pipeline_spark.operators.textstats import (
    wordpiece_encode_counts,
    wordpiece_train,
)
from txf_continuous_data_pipeline_spark.queries.text import (
    _wordpiece_counts_sql,
)

# '#'-heavy so the trainer merges '#' with '###' into the plain form
# '##' (the pathological vocab entry), plus ordinary words and a word
# no vocab can cover ('@@' - chars never in any merge or the ascii
# alphabet -> [UNK] on both engines)
DOCS = [
    (0, "## aa ## aa bb", "s0", "en"),
    (1, "#x aa ## bb bb", "s0", "en"),
    (2, "cc ## ## aa @@", "s1", "en"),
    (3, "#### aa cc cc", "s1", "en"),
]


def _operator_counts(spark, docs):
    merges = wordpiece_train(docs, n_merges=10)
    alphabet = set()
    for _, left, right, _m, _n in merges:
        alphabet.add(left)
        alphabet.add(right)
    base = set(string.ascii_lowercase) | set(string.digits)
    vocab = (
        base
        | {"##" + c for c in base}
        | alphabet
        | {m for _, _l, _r, m, _n in merges}
    )
    return {
        (r["piece"], r["n"])
        for r in wordpiece_encode_counts(docs, vocab).collect()
    }


def test_oracle_matches_operator_on_hash_corpus(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, source string, lang string"
    )
    want = _operator_counts(spark, docs)
    # the trainer on this corpus must actually produce the
    # pathological plain '##' form, or the regression pin is hollow
    merges = wordpiece_train(docs, n_merges=10)
    assert any(
        m == "##" for _, _l, _r, m, _n in merges
    ), f"fixture drifted: no plain '##' merge in {merges}"

    con = duckdb.connect()
    con.register(
        "documents",
        docs.toPandas(),
    )
    # the old vocabl classification never returned on this corpus -
    # a finite result IS the termination assertion
    got = {
        (piece, int(n))
        for piece, n in con.execute(_wordpiece_counts_sql(10)).fetchall()
    }
    assert got == want and got
    assert any(p == "[UNK]" for p, _ in got)  # '@@' word dead-ends
