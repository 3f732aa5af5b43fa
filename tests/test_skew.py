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


# ------------------------------------------------------------ sketches


def test_count_min_overestimates_and_bounds(spark):
    import collections
    import random

    from txf_continuous_data_pipeline_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )

    rng = random.Random(6)
    vals = [rng.randrange(200) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    DEPTH, WIDTH = 4, 256
    sk = count_min_build(df, key_col="k", depth=DEPTH, width=WIDTH)
    keys = df.distinct()
    est = {
        r["k"]: r["est"]
        for r in count_min_estimate(
            sk, keys, key_col="k", depth=DEPTH, width=WIDTH
        ).collect()
    }
    true = collections.Counter(vals)
    n = len(vals)
    assert est.keys() == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)  # never underestimates
        assert est[k] <= t + 2 * n / WIDTH * 4, (k, est[k], t)
    # with 200 keys over 256 buckets most estimates should be exact-ish
    exact = sum(1 for k in true if est[k] == true[k])
    assert exact >= len(true) * 0.3


def test_count_min_merge_is_union_groupby(spark):
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.sketches import (
        count_min_build,
    )

    a = spark.createDataFrame([(i % 7,) for i in range(100)], ["k"])
    b = spark.createDataFrame([(i % 5,) for i in range(60)], ["k"])
    merged = (
        count_min_build(a, key_col="k")
        .unionByName(count_min_build(b, key_col="k"))
        .groupBy("lane", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = count_min_build(a.unionByName(b), key_col="k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_no_false_negatives(spark):
    from txf_continuous_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
    )

    members = spark.createDataFrame([(i,) for i in range(300)], ["k"])
    others = spark.createDataFrame(
        [(i,) for i in range(10_000, 10_300)], ["k"]
    )
    bloom = bloom_build(members, key_col="k").localCheckpoint(eager=True)
    got_m = {
        r["k"]: r["may_contain"]
        for r in bloom_contains(bloom, members, key_col="k").collect()
    }
    assert all(got_m.values()), "bloom false negative"
    got_o = {
        r["k"]: r["may_contain"]
        for r in bloom_contains(bloom, others, key_col="k").collect()
    }
    fp = sum(1 for v in got_o.values() if v)
    # 5 hashes, 300 keys, 4096 bits -> fp ~ (1-e^-0.366)^5 ~ 0.25%
    assert fp <= 15, fp


def test_fuzzy_hot_block_cap_bounds_candidates(spark):
    """A boilerplate token shared by many names (every name ends in
    'corp') makes its block quadratic; the cap drops that block while
    pairs sharing an UNCAPPED key survive."""
    from txf_continuous_data_pipeline_spark.operators.linkage import (
        blocked_fuzzy_pairs,
    )

    names = [(f"name{i:03d} corp",) for i in range(60)]
    names += [("acme corp",), ("acmo corp",)]
    df = spark.createDataFrame(names, ["name"])
    capped = blocked_fuzzy_pairs(
        df, name_col="name", max_distance=1, max_block_size=10
    ).collect()
    # the 'corp' block (62 names) is dropped entirely; acme/acmo share
    # only that capped key, and the nameXXX first tokens are unique ->
    # with the cap nothing remains
    assert capped == []
    uncapped = {
        (r["name_a"], r["name_b"])
        for r in blocked_fuzzy_pairs(
            df, name_col="name", max_distance=1
        ).collect()
    }
    assert ("acme corp", "acmo corp") in uncapped


def test_hll_estimate_within_error_and_merge(spark):
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], ["k"])
    sk = hll_build(df, key_col="k", p=9)
    est = hll_estimate(sk, p=9).collect()[0]["n_distinct_est"]
    # standard error ~ 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
    assert abs(est - n) / n < 0.14, est

    # merge = union + groupBy.max must equal the direct build
    a = spark.createDataFrame([(i,) for i in range(0, 3000)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(2000, n)], ["k"])
    merged = (
        hll_build(a, key_col="k")
        .unionByName(hll_build(b, key_col="k"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, sk.collect())
    )


def test_hll_linear_counting_small_range(spark):
    from txf_continuous_data_pipeline_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    df = spark.createDataFrame([(i,) for i in range(30)], ["k"])
    est = hll_estimate(hll_build(df, key_col="k")).collect()[0][
        "n_distinct_est"
    ]
    assert abs(est - 30) <= 2, est


def test_bloom_duplicate_probe_keys_no_false_negative(spark):
    # fact-side probe frames carry duplicate keys by nature; a member
    # appearing twice must still probe True (regression: the hit-count
    # fold saw 2*n_hashes rows and failed the == n_hashes test)
    from txf_continuous_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
    )

    members = spark.createDataFrame([(1,), (2,)], ["k"])
    bloom = bloom_build(members, key_col="k")
    probe = spark.createDataFrame([(1,), (1,), (1,), (3,)], ["k"])
    got = {
        r["k"]: r["may_contain"]
        for r in bloom_contains(bloom, probe, key_col="k").collect()
    }
    assert got[1] is True


def test_sketches_handle_null_keys(spark):
    from txf_continuous_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        count_min_build,
        count_min_estimate,
        hll_build,
        hll_estimate,
    )

    df = spark.createDataFrame([(1,), (None,), (None,)], "k long")
    sk = count_min_build(df, key_col="k")
    est = {
        r["k"]: r["est"]
        for r in count_min_estimate(sk, df.distinct(), key_col="k").collect()
    }
    assert est[None] >= 2  # nulls counted AND matchable
    bloom = bloom_build(df, key_col="k")
    got = {
        r["k"]: r["may_contain"]
        for r in bloom_contains(bloom, df.distinct(), key_col="k").collect()
    }
    assert got[None] is True
    n = hll_estimate(hll_build(df, key_col="k")).collect()[0][
        "n_distinct_est"
    ]
    assert 1 <= n <= 3


def test_hll_empty_input_estimates_zero(spark):
    from txf_continuous_data_pipeline_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    df = spark.createDataFrame([], "k long")
    assert (
        hll_estimate(hll_build(df, key_col="k")).collect()[0][
            "n_distinct_est"
        ]
        == 0
    )


def test_kmv_estimate_within_kmv_error_and_mergeable(spark):
    """KMV with k=64 has relative std error ~1/sqrt(k-2) ~ 13%; pin a
    3-sigma band on a 1000-distinct synthetic stream, plus the
    defining merge property: bottom-k of a union == bottom-k of the
    per-shard bottom-k's."""
    from txf_continuous_data_pipeline_spark.operators.dedup import h60

    k = 64
    ids = spark.range(1000).select(
        h60(F.col("id").cast("string")).alias("hv")
    )
    bottom = [r["hv"] for r in ids.orderBy("hv").limit(k).collect()]
    est = (k - 1) / (bottom[-1] / float(1 << 60))
    assert abs(est - 1000) / 1000 < 0.4  # 3 sigma of ~13%
    # merge: shard by parity, take per-shard bottom-k, merge, re-take
    shard_a = [r["hv"] for r in spark.range(0, 1000, 2).select(
        h60(F.col("id").cast("string")).alias("hv")
    ).orderBy("hv").limit(k).collect()]
    shard_b = [r["hv"] for r in spark.range(1, 1000, 2).select(
        h60(F.col("id").cast("string")).alias("hv")
    ).orderBy("hv").limit(k).collect()]
    merged = sorted(shard_a + shard_b)[:k]
    assert merged == bottom


def test_bottomk_sample_is_mergeable_and_uniformish(spark, sf_dir):
    """bottom-k of the union == bottom-k of per-shard bottom-k's, on
    the real query; and the sample must not be degenerate (it spans
    multiple sources)."""
    from txf_continuous_data_pipeline_spark.queries import REGISTRY

    out = REGISTRY["bottomk_sample"][0](spark, sf_dir)
    rows = out.collect()
    keys = [r["sample_key"] for r in rows]
    assert keys == sorted(keys) and len(rows) == 50
    assert len({r["source"] for r in rows}) > 1
    from txf_continuous_data_pipeline_spark.operators.dedup import h60
    from txf_continuous_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", h60(F.col("doc_id").cast("string")).alias("sk")
    )
    sa = docs.where(F.col("doc_id") % 2 == 0).orderBy("sk").limit(50)
    sb = docs.where(F.col("doc_id") % 2 == 1).orderBy("sk").limit(50)
    merged = sorted(
        [r["sk"] for r in sa.collect()] + [r["sk"] for r in sb.collect()]
    )[:50]
    assert merged == keys
