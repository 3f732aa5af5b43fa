"""Pin the n-gram repetition metrics (sorted-run fold) against
hand-computed cases and the relational (explode -> group) form."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    gopher_quality_flags,
    ngram_repetition_stats,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_short_doc_is_empty(spark):
    df = _docs(spark, [(1, "one two"), (2, "single")]).select(
        "doc_id", word_ngrams(F.split(F.col("text"), " "), 3).alias("ng")
    )
    got = {r.doc_id: list(r.ng) for r in df.collect()}
    assert got == {1: [], 2: []}


def test_repetition_hand_case(spark):
    # bigrams of "a b a b a c": [a b, b a, a b, b a, a c] -> n=5,
    # top count 2 (a b / b a tie), dup occurrences 4 (both doubled)
    df = ngram_repetition_stats(_docs(spark, [(1, "a b a b a c")]), n=2)
    r = df.collect()[0]
    assert (r.n_ngrams, r.top_ngram_count, r.dup_ngram_occurrences) == (
        5,
        2,
        4,
    )
    assert r.top_ngram_frac == 0.4 and r.dup_ngram_frac == 0.8


def test_repetition_no_repeats(spark):
    df = ngram_repetition_stats(_docs(spark, [(1, "w x y z")]), n=2)
    r = df.collect()[0]
    assert (r.n_ngrams, r.top_ngram_count, r.dup_ngram_occurrences) == (
        3,
        1,
        0,
    )


def test_repetition_matches_explode_form(spark, sf_dir):
    """Differential: the zero-shuffle fold == the relational route on
    real docs."""
    from txf_continuous_data_pipeline_spark.operators.dedup import (
        normalized_tokens,
    )
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        word_ngrams as wng,
    )
    from txf_continuous_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    fold = ngram_repetition_stats(docs, n=3)
    rel = (
        docs.select(
            "doc_id",
            F.explode(wng(normalized_tokens(F.col("text")), 3)).alias("ng"),
        )
        .groupBy("doc_id", "ng")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_ngrams"),
            F.max("count").alias("top_ngram_count"),
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias(
                "dup_ngram_occurrences"
            ),
        )
    )
    a = {
        r.doc_id: (r.n_ngrams, r.top_ngram_count, r.dup_ngram_occurrences)
        for r in fold.collect()
    }
    b = {
        r.doc_id: (r.n_ngrams, r.top_ngram_count, r.dup_ngram_occurrences)
        for r in rel.collect()
    }
    assert a == b


def test_gopher_flags_thresholds(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy sleeping dog "
            "while nobody watches anything particular today indeed"),  # ok
        (2, "tiny doc"),  # fails token bound
        (3, " ".join(["spam ham"] * 20)),  # repetition bomb
    ]
    got = {r.doc_id: r for r in gopher_quality_flags(_docs(spark, rows)).collect()}
    assert got[1].keep
    assert not got[2].flag_tokens and not got[2].keep
    assert not got[3].flag_top_bigram and not got[3].keep


def test_split_assign_stable_under_corpus_growth(spark, sf_dir):
    """A doc's split never changes when the corpus grows - the property
    rand()-based splits lack and the reason the assignment is
    hash-based."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        split_assign,
    )
    from txf_continuous_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    full = {
        r.doc_id: r.split for r in split_assign(docs).select("doc_id", "split").collect()
    }
    subset = {
        r.doc_id: r.split
        for r in split_assign(docs.where(F.col("doc_id") % 3 == 0))
        .select("doc_id", "split")
        .collect()
    }
    assert subset == {k: v for k, v in full.items() if k % 3 == 0}
    assert set(full.values()) == {"train", "val", "test"}


def test_funnel_dropoff_and_ordering(spark):
    """Funnel semantics: steps must occur in order; out-of-order events
    don't count; a user stalls at their last reached step."""
    import datetime as dt

    from txf_continuous_data_pipeline_spark.operators.relational import (
        funnel_counts,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes in order
        (1, t(1), 1, "signup"), (2, t(2), 1, "view"),
        (3, t(3), 1, "click"), (4, t(4), 1, "purchase"),
        # u2: purchase BEFORE click -> stalls at view
        (5, t(1), 2, "signup"), (6, t(2), 2, "view"),
        (7, t(3), 2, "purchase"), (8, t(4), 2, "click"),
        # u3: never signs up -> reaches nothing
        (9, t(1), 3, "view"), (10, t(2), 3, "click"),
        # u4: signup only
        (11, t(5), 4, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r.step: r.users
        for r in funnel_counts(
            df, ("signup", "view", "click", "purchase")
        ).collect()
    }
    # u2's click at t4 comes after the stall? no: funnel needs click
    # after view (t2) -> the t4 click DOES advance u2 to click. But the
    # purchase at t3 precedes the click, so u2 never purchases.
    assert got == {"signup": 3, "view": 2, "click": 2, "purchase": 1}


from hypothesis import given, settings
from hypothesis import strategies as st

_token = st.sampled_from(["a", "b", "ab", "ba", "x"])
_doc = st.lists(_token, min_size=0, max_size=12)


@settings(max_examples=15, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_repetition_fold_matches_counter(spark, docs):
    """Property: the sorted-run fold equals a Python Counter reference
    on arbitrary token streams (ties, empties, single-token docs)."""
    from collections import Counter

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_ngrams, r.top_ngram_count, r.dup_ngram_occurrences)
        for r in ngram_repetition_stats(df, n=2).collect()
    }
    for i, d in enumerate(docs):
        # mirror normalized_tokens: split on whitespace AFTER join, so
        # an empty doc yields the single empty token, like Spark/DuckDB
        toks = " ".join(d).split(" ")
        grams = [
            " ".join(toks[j : j + 2]) for j in range(len(toks) - 1)
        ]
        c = Counter(grams)
        expect = (
            len(grams),
            max(c.values()) if c else 0,
            sum(v for v in c.values() if v > 1),
        )
        assert got[i] == expect, (i, d, got[i], expect)


def test_bigram_logprob_hand_example(spark):
    """Add-one-smoothed bigram scores on a corpus small enough to
    compute by hand: corpus tokens = 'a b a b', 'a b', 'solo' so
    V=3, c(a,b)=3, c(b,a)=1, c1(a)=3, c1(b)=3.
    lp(a,b)=ln((3+1)/(3+3)); lp(b,a)=ln((1+1)/(3+3))."""
    import math

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        bigram_logprob,
    )

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "solo")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.avg_logprob, r.n_bigrams)
        for r in bigram_logprob(df).collect()
    }
    lp_ab = math.log(4 / 6)
    lp_ba = math.log(2 / 6)
    assert got[0] == (round((2 * lp_ab + lp_ba) / 3, 6), 3)
    assert got[1] == (round(lp_ab, 6), 1)
    assert 2 not in got  # single-token doc: no bigrams, no row


def test_entropy_stats_orders_gibberish_below_prose(spark):
    """Low-entropy detectors: a repeated-char blob scores near zero on
    char entropy, a stuffed page scores zero token entropy, real prose
    scores high on both; exact hand values pin the aggregate identity
    H = ln(n) - sum(c ln c)/n."""
    import math

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        entropy_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaa"),                      # char H = 0
            (2, "buy buy buy buy"),               # token H = 0
            (3, "the quick brown fox jumps"),     # real prose
            (4, "abab"),                          # char H = ln 2
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.char_entropy, r.token_entropy)
        for r in entropy_stats(docs).collect()
    }
    assert got[1][0] == 0.0
    assert got[2][1] == 0.0
    assert got[4][0] == round(math.log(2), 6)
    assert got[3][0] > got[1][0] and got[3][1] > got[2][1]


def test_entropy_total_over_degenerate_docs(spark):
    """Empty / whitespace / punctuation-only docs must get a row with
    0.0 entropies, not vanish (downstream reports anchor on it)."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        entropy_stats,
    )

    df = spark.createDataFrame(
        [(1, "spark spark filter"), (2, ""), (3, None), (4, "... ...")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in entropy_stats(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[2]["char_entropy"] == 0.0
    assert out[2]["token_entropy"] == 0.0
    assert out[3]["token_entropy"] == 0.0
    assert out[1]["token_entropy"] > 0.0
    # punctuation-only: chars exist, tokens do not
    assert out[4]["char_entropy"] > 0.0
    assert out[4]["token_entropy"] == 0.0
