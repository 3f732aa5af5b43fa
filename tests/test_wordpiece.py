"""WordPiece trainer + greedy encoder: pure-Python trainer
differential, driver == distributed path agreement, likelihood-score
semantics (rare-pair beats frequent-pair when unigrams are common),
and the longest-match-first segmenter on hand-built words."""

from __future__ import annotations

from collections import Counter

from txf_continuous_data_pipeline_spark.operators.textstats import (
    _wp_merge,
    wordpiece_encode_counts,
    wordpiece_train,
)

DOCS = [
    (1, "hug hug hug pug pun bun hugs"),
    (2, "hug pug pun pun bun hugs hug"),
    (3, "unhug hugs pug bun bun pun"),
]


def _ref_train(texts, n_merges):
    """Transparent reference: explicit symbol lists, full recount each
    step, argmax of count(l,r)/(count(l)count(r)) with (score desc,
    pair asc) tie-break."""
    word_freq = Counter(
        w for t in texts for w in t.lower().strip().split()
    )
    words = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in word_freq
    }
    merges = []
    for step in range(n_merges):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, syms in words.items():
            f = word_freq[w]
            for s in syms:
                sc[s] += f
            for p in zip(syms, syms[1:]):
                pc[p] += f
        best = None
        for p, c in pc.items():
            if c < 2:
                continue
            key = (-(c / (sc[p[0]] * sc[p[1]])), p)
            if best is None or key < best[0]:
                best = (key, c)
        if best is None:
            break
        (_, (l, r)), c = best
        m = _wp_merge(l, r)
        merges.append((step, l, r, m, c))
        for w, syms in words.items():
            out, pend = [], None
            for x in syms:
                if pend == l and x == r:
                    out.append(m)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            words[w] = out
    return merges


def test_wordpiece_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = wordpiece_train(df, n_merges=6)
    ref = _ref_train([t for _, t in DOCS], 6)
    assert got == ref


def test_wordpiece_distributed_path_matches_driver(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    local = wordpiece_train(df, n_merges=4)
    dist = wordpiece_train(df, n_merges=4, driver_vocab_limit=0)
    assert local == dist


def test_wordpiece_score_prefers_exclusive_pair(spark):
    """'xy' appears 3x but x,y are everywhere; 'qz' appears 2x and q,z
    appear ONLY together - likelihood gain must pick (q, ##z) first,
    where raw-count BPE would pick the frequent pair."""
    df = spark.createDataFrame(
        [(1, "xy xy xy xq yx qz qz")], "doc_id long, text string"
    )
    got = wordpiece_train(df, n_merges=1)
    assert got[0][1:4] == ("q", "##z", "qz")


def test_wordpiece_greedy_segmenter(spark):
    """Longest-match-first with [UNK] dead ends, counts scaled by
    word frequency."""
    df = spark.createDataFrame(
        [(1, "hugs hugs bun zz")], "doc_id long, text string"
    )
    vocab = {"hug", "##s", "b", "##u", "##n", "h", "##ug"}
    got = {
        r.piece: r.n
        for r in wordpiece_encode_counts(df, vocab).collect()
    }
    # 'hugs' -> hug + ##s (longest prefix 'hug', not 'h'), twice
    # 'bun' -> b ##u ##n ; 'zz' -> [UNK]
    assert got == {
        "hug": 2,
        "##s": 2,
        "b": 1,
        "##u": 1,
        "##n": 1,
        "[UNK]": 1,
    }
