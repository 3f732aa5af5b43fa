"""Kneser-Ney differential: per-doc scores must equal a transparent
numpy/pure-Python reference on a hand corpus, and the per-context
distribution must sum to exactly 1 over the continuation vocabulary."""

from __future__ import annotations

import math
from collections import Counter

from txf_continuous_data_pipeline_spark.operators.textstats import (
    kneser_ney_logprob,
)

D = 0.75

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "the the the"),
    (4, "single"),  # no bigrams -> no row
]


def _model():
    bi = Counter()
    for _i, text in DOCS:
        toks = text.lower().split()
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
    ctx = Counter()
    n1_fwd = Counter()
    n1_back = Counter()
    for (a, b), c in bi.items():
        ctx[a] += c
        n1_fwd[a] += 1
        n1_back[b] += 1
    t = len(bi)

    def p(a, b):
        return max(bi[(a, b)] - D, 0) / ctx[a] + D * n1_fwd[a] / ctx[a] * (
            n1_back[b] / t
        )

    return bi, ctx, n1_fwd, n1_back, t, p


def test_kn_matches_reference_and_sums_to_one(spark):
    emb = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_kn_logprob"])
        for r in kneser_ney_logprob(emb).collect()
    }
    bi, ctx, n1_fwd, n1_back, t, p = _model()

    assert 4 not in got  # single-token doc has no bigrams
    for doc_id, text in DOCS[:4]:
        toks = text.lower().split()
        grams = list(zip(toks, toks[1:]))
        want = sum(math.log(p(a, b)) for a, b in grams) / len(grams)
        n, score = got[doc_id]
        assert n == len(grams)
        assert abs(score - round(want, 6)) < 2e-6, (doc_id, score, want)

    # closure: for every observed context, total probability over the
    # continuation vocabulary is exactly 1 (the property add-one lacks
    # without paying V in the denominator)
    vocab = set(n1_back)
    for a in ctx:
        s = sum(p(a, b) for b in vocab)
        assert abs(s - 1.0) < 1e-12, (a, s)
