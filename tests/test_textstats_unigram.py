"""Unigram-LM (SentencePiece-style) trainer differential: the engine's
EM + prune loop must exactly reproduce a transparent pure-Python
reference on a hand corpus (same seed rule, same fixed logaddexp
accumulation order, same tie-breaks), the Viterbi encoder must agree
with brute-force best-segmentation enumeration, and the distributed EM
path must match the driver path."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import pytest

from txf_continuous_data_pipeline_spark.operators.textstats import (
    _unigram_viterbi,
    unigram_encode_counts,
    unigram_lm_train,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cats sat on the mats"),
    (2, "that hat on that mat"),
    (3, "on on on the the"),
]
L = 3  # max piece length


def _ref_train(vocab_size, seed_size, em_iters, prune_frac):
    """Independent reference: dict/Counter implementation of the same
    documented algorithm (MLE M-step, expected-count pruning)."""
    words = Counter()
    for _i, text in DOCS:
        for w in text.lower().split():
            words[w] += 1

    cand = Counter()
    for w, n in words.items():
        for s in range(len(w)):
            for e in range(s + 1, min(len(w), s + L) + 1):
                cand[w[s:e]] += n
    chars = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    counts = {**chars, **dict(multi)}

    def norm(c):
        t = math.fsum(c.values())
        return {p: math.log(v / t) for p, v in c.items() if v > 0}

    def fb(word, logp):
        import numpy as np

        neg = float("-inf")
        n = len(word)
        alpha = [0.0] + [neg] * n
        for i in range(1, n + 1):
            a = neg
            for j in range(max(0, i - L), i):
                lp = logp.get(word[j:i])
                if lp is not None and alpha[j] != neg:
                    a = np.logaddexp(a, alpha[j] + lp)
            alpha[i] = a
        beta = [neg] * n + [0.0]
        for j in range(n - 1, -1, -1):
            b = neg
            for e in range(j + 1, min(n, j + L) + 1):
                lp = logp.get(word[j:e])
                if lp is not None and beta[e] != neg:
                    b = np.logaddexp(b, lp + beta[e])
            beta[j] = b
        z = alpha[n]
        out = {}
        for j in range(n):
            if alpha[j] == neg:
                continue
            for e in range(j + 1, min(n, j + L) + 1):
                lp = logp.get(word[j:e])
                if lp is not None and beta[e] != neg:
                    out[word[j:e]] = out.get(word[j:e], 0.0) + float(
                        np.exp(alpha[j] + lp + beta[e] - z)
                    )
        return out

    def em(logp):
        agg = {}
        for w, n in words.items():
            for p, c in fb(w, logp).items():
                agg[p] = agg.get(p, 0.0) + n * c
        return agg

    logp = norm(counts)
    single = {p for p in logp if len(p) == 1}
    while True:
        for _ in range(em_iters):
            logp = norm(em(logp))
        n_multi = sum(1 for p in logp if len(p) > 1)
        target = max(vocab_size - len(single), 0)
        if n_multi <= target:
            break
        exp = em(logp)
        ranked = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (exp.get(p, 0.0), [-ord(ch) for ch in p]),
        )
        n_drop = min(max(int(n_multi * prune_frac), 1), n_multi - target)
        dropped = set(ranked[:n_drop])
        logp = norm(
            {p: math.exp(lp) for p, lp in logp.items() if p not in dropped}
        )
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.mark.parametrize("limit", [200_000, 0], ids=["driver", "distributed"])
def test_unigram_train_matches_pure_python_reference(spark, limit):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = unigram_lm_train(
        df,
        vocab_size=14,
        seed_size=10,
        max_piece_len=L,
        em_iters=2,
        prune_frac=0.34,
        driver_vocab_limit=limit,
    )
    want = _ref_train(14, 10, 2, 0.34)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (_wp, wl) in zip(got, want):
        assert math.isclose(gl, wl, rel_tol=1e-9, abs_tol=1e-12), (gp, gl, wl)
    # single chars are never pruned and the target size is respected
    assert {p for p, _ in got if len(p) == 1} == set("thecasonm")
    assert len(got) <= 14 + 0  # chars + kept multi fit the budget wiggle


def test_unigram_viterbi_matches_bruteforce():
    vocab = {"a": -2.0, "b": -2.5, "ab": -1.2, "ba": -3.0, "aba": -1.5}

    def brute(word):
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=max(n - 1, 0)):
            pieces, start = [], 0
            for i, c in enumerate(cuts, 1):
                if c:
                    pieces.append(word[start:i])
                    start = i
            pieces.append(word[start:])
            if any(p not in vocab or len(p) > 3 for p in pieces):
                continue
            score = sum(vocab[p] for p in pieces)
            if best is None or score > best[0]:
                best = (score, pieces)
        return best

    for word in ["ab", "aba", "abab", "ababa", "bab", "aaab"]:
        got = _unigram_viterbi(word, vocab, 3)
        want = brute(word)
        if want is None:
            assert got is None
        else:
            assert got is not None
            assert math.isclose(
                sum(vocab[p] for p in got), want[0], rel_tol=1e-12
            ), (word, got, want)
    assert _unigram_viterbi("abc", vocab, 3) is None  # 'c' uncovered


def test_unigram_encode_counts_and_unk(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab = unigram_lm_train(
        df, vocab_size=14, seed_size=10, max_piece_len=L, em_iters=2,
        prune_frac=0.34,
    )
    counts = {
        r["piece"]: r["n"]
        for r in unigram_encode_counts(
            df, vocab, max_piece_len=L
        ).collect()
    }
    # total encoded piece-chars reconstruct the corpus exactly: every
    # word is fully covered, so sum(len(piece)*n) == total word chars
    total_chars = sum(
        len(w) * n
        for w, n in Counter(
            w for _i, t in DOCS for w in t.lower().split()
        ).items()
    )
    assert sum(len(p) * n for p, n in counts.items()) == total_chars
    assert "<unk>" not in counts
    # a word with a never-seen char hits the sentinel, not a crash
    foreign = spark.createDataFrame(
        [(9, "zzz the")], "doc_id long, text string"
    )
    fc = {
        r["piece"]: r["n"]
        for r in unigram_encode_counts(
            foreign, vocab, max_piece_len=L
        ).collect()
    }
    assert fc.get("<unk>") == 1
