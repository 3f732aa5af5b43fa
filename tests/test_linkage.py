"""Record-linkage, interval-overlap, SCD2, and profiling operator tests.

Strategy mirrors the suite's pattern: small hand-built frames with
hand-computable answers, plus a testdata-scale recall measurement for
the blocking contract (the part the oracle, which shares the blocking
predicate, cannot see).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    interval_overlap_pairs,
    scd2_build,
)
from txf_continuous_data_pipeline_spark.operators.profiling import (
    group_zscore_outliers,
    profile_table,
)
from txf_continuous_data_pipeline_spark.sources import read_table


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(
        minutes=m, seconds=s
    )


# ---------------------------------------------------------------- fuzzy


def test_fuzzy_pairs_blocked_and_verified(spark):
    df = spark.createDataFrame(
        [("red widget",), ("hot widget",), ("red widget",),
         ("red gadget",), ("blue bolt",)],
        ["name"],
    )
    got = {
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in blocked_fuzzy_pairs(df, name_col="name").collect()
    }
    # red/hot widget share the last token but distance 3 -> excluded at
    # the default 2; red gadget/red widget (distance 2, shares BOTH the
    # first token and no last token) appears exactly once.
    assert got == {("red gadget", "red widget", 2)}
    got3 = {
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in blocked_fuzzy_pairs(
            df, name_col="name", max_distance=3
        ).collect()
    }
    assert got3 == {
        ("hot widget", "red widget", 3),
        ("red gadget", "red widget", 2),
    }


def test_fuzzy_blocking_recall_bruteforce_python(spark, sf_dir):
    """On testdata, first-or-last-token blocking loses NO pair of the
    unblocked Levenshtein<=2 ground truth (the oracle shares the
    blocking predicate, so this is the recall check it can't do)."""
    part = read_table(spark, sf_dir, "part").select("p_name")
    blocked = {
        (r["name_a"], r["name_b"])
        for r in blocked_fuzzy_pairs(part, name_col="p_name").collect()
    }

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = sorted({r["p_name"] for r in part.distinct().collect()})
    truth = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if lev(a, b) <= 2
    }
    # blocking is declared semantics, so blocked is a subset of truth;
    # on this vocabulary it is exactly truth (100% recall).
    assert blocked == truth


# -------------------------------------------------------------- overlap


def test_interval_overlap_matches_naive(spark):
    rows = [
        # (entity, seq, start, end)
        (1, 1, _ts(0), _ts(10)),
        (2, 1, _ts(5), _ts(15)),     # overlaps e1s1 by 5 min
        (2, 2, _ts(20), _ts(25)),    # overlaps nothing of entity 1
        (3, 1, _ts(24), _ts(90)),    # long: crosses 2 hour buckets,
                                     # overlaps e2s2 by 1 min
        (1, 2, _ts(10, 30), _ts(10, 30)),  # instant; touches e2s1
    ]
    iv = spark.createDataFrame(rows, ["ent", "seq", "s", "e"])
    got = {
        (r["entity_a"], r["seq_a"], r["entity_b"], r["seq_b"],
         r["overlap_us"])
        for r in interval_overlap_pairs(
            iv, entity_col="ent", seq_col="seq",
            start_col="s", end_col="e", bucket="hour",
        ).collect()
    }
    naive = set()
    for ea, qa, sa, xa in rows:
        for eb, qb, sb, xb in rows:
            if ea < eb and sa <= xb and sb <= xa:
                us = int(
                    (min(xa, xb) - max(sa, sb)).total_seconds() * 1e6
                )
                naive.add((ea, qa, eb, qb, us))
    assert got == naive
    assert (1, 2, 2, 1, 0) in got  # instant-touch edge: zero-length


def test_interval_overlap_bucket_invariant(spark):
    """Binning is lossless: hour and day buckets give identical pairs."""
    rows = [
        (i, 1, _ts(0) + dt.timedelta(minutes=7 * i),
         _ts(0) + dt.timedelta(minutes=7 * i + 50))
        for i in range(12)
    ]
    iv = spark.createDataFrame(rows, ["ent", "seq", "s", "e"])

    def pairs(bucket):
        return {
            tuple(r)
            for r in interval_overlap_pairs(
                iv, entity_col="ent", seq_col="seq",
                start_col="s", end_col="e", bucket=bucket,
            ).collect()
        }

    assert pairs("hour") == pairs("day") != set()


# ----------------------------------------------------------------- scd2


def test_scd2_runs_collapse_and_close(spark):
    rows = [
        (7, _ts(0), "A", 1),
        (7, _ts(1), "A", 2),   # same value -> same run
        (7, _ts(2), "B", 3),   # change -> new interval, closes A
        (7, _ts(3), "A", 4),   # back to A -> THIRD interval (SCD2, not
        (8, _ts(0), "X", 5),   # a distinct-values table)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "i"])
    got = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_build(
            df, key_col="k", ts_col="ts", attr_col="v", tiebreak_col="i"
        ).collect()
    )
    assert got == [
        (7, "A", _ts(0), _ts(2), False),
        (7, "A", _ts(3), None, True),
        (7, "B", _ts(2), _ts(3), False),
        (8, "X", _ts(0), None, True),
    ]


def test_scd2_tiebreak_determinism(spark):
    # two changes at the SAME timestamp: tiebreak orders them, so the
    # later id wins the open interval regardless of input order.
    rows = [(1, _ts(0), "A", 1), (1, _ts(5), "C", 3), (1, _ts(5), "B", 2)]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "i"]).repartition(3)
    got = sorted(
        (r["v"], r["is_current"])
        for r in scd2_build(
            df, key_col="k", ts_col="ts", attr_col="v", tiebreak_col="i"
        ).collect()
    )
    assert got == [("A", False), ("B", False), ("C", True)]


# -------------------------------------------------------------- profile


def test_profile_table_metrics(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, None, 4.0), (2, "y", None)],
        ["a", "b", "c"],
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["a"]["n_nulls"] == 0 and prof["a"]["n_distinct"] == 2
    assert prof["a"]["min_num"] == 1.0 and prof["a"]["max_num"] == 2.0
    assert prof["b"]["n_nulls"] == 1 and prof["b"]["n_distinct"] == 2
    assert prof["b"]["min_num"] is None  # non-numeric -> no min/max
    assert prof["c"]["n_nulls"] == 1 and prof["c"]["max_num"] == 4.0


def test_profile_table_approx_variant_same_shape(spark):
    df = spark.createDataFrame([(i, str(i % 7)) for i in range(100)],
                               ["a", "b"])
    exact = {r["column"]: r for r in profile_table(df).collect()}
    approx = {
        r["column"]: r
        for r in profile_table(df, exact_distinct=False).collect()
    }
    assert exact.keys() == approx.keys()
    # HLL at this cardinality is exact-ish; null counts always exact
    assert approx["b"]["n_nulls"] == 0
    assert abs(approx["a"]["n_distinct"] - 100) <= 5


# ------------------------------------------------------------- outliers


def test_zscore_outliers_planted(spark):
    vals = [(i, "t", 10.0) for i in range(30)] + [(99, "t", 1000.0)]
    df = spark.createDataFrame(vals, ["id", "g", "v"])
    got = group_zscore_outliers(
        df, group_col="g", value_col="v", id_cols=("id",), threshold=3.0
    ).collect()
    assert [r["id"] for r in got] == [99]
    assert got[0]["zscore"] > 3


def test_zscore_outliers_constant_group_no_rows(spark):
    # sd == 0 -> z undefined (null) -> never flagged, no crash
    df = spark.createDataFrame([(1, "g", 5.0), (2, "g", 5.0)],
                               ["id", "g", "v"])
    assert (
        group_zscore_outliers(
            df, group_col="g", value_col="v", id_cols=("id",)
        ).count()
        == 0
    )


# ----------------------------------------------------------- snapshot


def test_snapshot_diff_classifies_all_change_kinds(spark):
    from txf_continuous_data_pipeline_spark.operators.profiling import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, 40.0), (5, 50.0)], ["k", "v"]
    )
    got = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(
            old, new, key_cols=("k",), compare_cols=("v",)
        ).collect()
    }
    # 1 removed, 2 changed, 3 unchanged (null == null, null-safe),
    # 4 unchanged, 5 added
    assert got == {
        1: ("removed", 10.0, None),
        2: ("changed", 20.0, 25.0),
        5: ("added", None, 50.0),
    }


# ------------------------------------------------------- expectations


def test_expect_counts_violations_per_rule(spark):
    from txf_continuous_data_pipeline_spark.operators.profiling import (
        expect,
        expect_unique_key,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 3.0), (2, 0.0)], ["k", "v"]
    )
    got = {
        r["rule"]: (r["n_violations"], r["n_rows"], r["pass_rate"])
        for r in expect(
            df,
            [
                ("non_null:k", F.col("k").isNull()),
                ("positive:v", F.col("v") <= 0),
            ],
        ).collect()
    }
    assert got == {
        "non_null:k": (1, 4, 0.75),
        "positive:v": (2, 4, 0.5),
    }
    uq = expect_unique_key(df, ("k",)).collect()[0]
    # k=2 appears twice -> 2 violating rows of 4
    assert (uq["rule"], uq["n_violations"], uq["n_rows"]) == (
        "unique_key:k", 2, 4,
    )


def test_expect_empty_frame_passes_vacuously(spark):
    # ADVICE r5: pass_rate used to be NULL on an empty input (0/0), so
    # a downstream gate like `pass_rate < 0.99` silently never fired.
    # Empty-input semantics are now DEFINED: no rows -> vacuous pass,
    # pass_rate 1.0, in all three expectation variants.
    from txf_continuous_data_pipeline_spark.operators.profiling import (
        expect,
        expect_referential,
        expect_unique_key,
    )

    df = spark.createDataFrame([], "k long, v double")
    rows = expect(df, [("non_null:k", F.col("k").isNull())]).collect()
    assert rows[0]["n_violations"] == 0 and rows[0]["n_rows"] == 0
    assert rows[0]["pass_rate"] == 1.0

    uq = expect_unique_key(df, ["k"]).collect()[0]
    assert uq["n_rows"] == 0 and uq["pass_rate"] == 1.0

    dim = spark.createDataFrame([(1,)], ["pk"])
    rf = expect_referential(df, dim, fk="k", pk="pk").collect()[0]
    assert rf["n_rows"] == 0 and rf["pass_rate"] == 1.0


def test_scd2_intervals_partition_timeline_random(spark):
    """Property on seeded random data: per key, SCD2 intervals are
    disjoint, contiguous (each valid_to equals the next valid_from),
    start at the key's first event, and exactly one row is open."""
    import random

    rng = random.Random(20260814)
    rows = [
        (
            rng.randrange(6),
            _ts(rng.randrange(0, 600), rng.randrange(60)),
            rng.choice("ABC"),
            i,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "i"]).repartition(5)
    got = scd2_build(
        df, key_col="k", ts_col="ts", attr_col="v", tiebreak_col="i"
    ).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["k"], []).append(r)
    first_ts = {}
    for k, ts, _v, _i in rows:
        if k not in first_ts or ts < first_ts[k]:
            first_ts[k] = ts
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert ivs[0]["valid_from"] == first_ts[k]
        opens = [r for r in ivs if r["valid_to"] is None]
        assert len(opens) == 1 and ivs[-1]["is_current"]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], (k, a, b)
        # runs alternate: consecutive intervals never share a value
        for a, b in zip(ivs, ivs[1:]):
            assert a["event_type" if "event_type" in a else "v"] != \
                b["event_type" if "event_type" in b else "v"]


def test_expect_referential_counts_orphans(spark):
    from txf_continuous_data_pipeline_spark.operators.profiling import (
        expect_referential,
    )

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    dim = spark.createDataFrame([(10,), (20,)], "pk long")
    r = expect_referential(fact, dim, fk="fk", pk="pk").collect()[0]
    # 99 is an orphan; the NULL fk is not (separate non-null rule)
    assert (r["rule"], r["n_violations"], r["n_rows"], r["pass_rate"]) == (
        "referential:fk->pk", 1, 4, 0.75,
    )


def test_scd2_null_attribute_is_a_distinct_value(spark):
    # a change TO null opens a null-valued interval; returning to the
    # pre-null value opens a THIRD interval (null is an ordinary value,
    # matching the streaming twin's Python != semantics)
    rows = [(1, _ts(0), "A", 1), (1, _ts(1), None, 2), (1, _ts(2), "A", 3)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string, i long")
    got = sorted(
        [
            (r["v"], r["valid_from"], r["valid_to"])
            for r in scd2_build(
                df, key_col="k", ts_col="ts", attr_col="v", tiebreak_col="i"
            ).collect()
        ],
        key=lambda t: t[1],
    )
    assert got == [
        ("A", _ts(0), _ts(1)),
        (None, _ts(1), _ts(2)),
        ("A", _ts(2), None),
    ]


def test_profile_table_dotted_column_name(spark):
    df = spark.createDataFrame([(1,), (2,)], ["x"]).withColumnRenamed(
        "x", "a.b"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["a.b"]["n_distinct"] == 2 and prof["a.b"]["max_num"] == 2.0


# ----------------------------------------------------------------- psi


def test_psi_zero_for_identical_and_large_for_shifted(spark):
    from txf_continuous_data_pipeline_spark.operators.profiling import (
        population_stability_index,
    )

    import random

    rng = random.Random(8)
    base = [(rng.uniform(0, 100),) for _ in range(2000)]
    ref = spark.createDataFrame(base, ["v"])
    same = spark.createDataFrame(base, ["v"])
    psi0 = population_stability_index(
        ref, same, value_col="v", lo=0.0, hi=100.0
    ).collect()[0]["psi"]
    assert abs(psi0) < 1e-9

    shifted = spark.createDataFrame(
        [(v + 50,) for (v,) in base], ["v"]
    )
    psi1 = population_stability_index(
        ref, shifted, value_col="v", lo=0.0, hi=100.0
    ).collect()[0]["psi"]
    assert psi1 > 0.25, psi1  # half the mass left its buckets


def test_profile_by_group_metrics(spark):
    from txf_continuous_data_pipeline_spark.operators.profiling import (
        profile_by_group,
    )

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 1, "x"), ("b", 2, "y")],
        ["g", "v", "s"],
    )
    got = {
        (r["group"], r["column"]): (r["n_nulls"], r["n_distinct"])
        for r in profile_by_group(
            df, group_col="g", columns=("v", "s")
        ).collect()
    }
    assert got == {
        ("a", "v"): (0, 1),
        ("a", "s"): (1, 1),
        ("b", "v"): (0, 1),
        ("b", "s"): (0, 1),
    }


def test_fuzzy_blocking_whitespace_normalized(spark):
    # ADVICE r5: \s+ tokenization vs the oracle's single-space split
    # diverged on irregular whitespace. Block keys now come from a
    # trim+collapse normalized form in BOTH engines: these three
    # spellings of "red widget" must all block together (edit distance
    # between raw forms still decides the verify).
    df = spark.createDataFrame(
        [("red widget",), ("red  widget",), (" red widget",),
         ("blue bolt",)],
        ["name"],
    )
    pairs = {
        (r.name_a, r.name_b)
        for r in blocked_fuzzy_pairs(
            df, name_col="name", max_distance=2
        ).collect()
    }
    assert (" red widget", "red widget") in pairs
    assert (" red widget", "red  widget") in pairs
    assert ("red  widget", "red widget") in pairs
    assert all("bolt" not in a and "bolt" not in b for a, b in pairs)
