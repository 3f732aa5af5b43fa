"""Session-level risk family (operators/returns.py r11 additions):
session_atr / overnight_gap_returns on planted bar frames with
numpy-differential expectations, plus the dup-cluster-histogram
conservation invariant. The oracle-parity suite covers these same
queries end-to-end; here the semantics are pinned on inputs small
enough to hand-check (first-session TR convention, window cap,
transition labels, guarded ln)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.returns import (
    overnight_gap_returns,
    session_atr,
    session_ohlc_summary,
)


def _bars(spark, rows):
    """rows: (bar_ts str, session_id, open, high, low, close, volume)."""
    df = spark.createDataFrame(
        rows,
        "bar_ts string, session_id string, open double, high double,"
        " low double, close double, volume long",
    )
    return df.withColumn("bar_ts", F.to_timestamp("bar_ts"))


_FOUR_SESSIONS = [
    # session A (day): two bars
    ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 105.0, 99.0, 104.0, 10),
    ("2024-01-02 09:05:00", "2024-01-02_D", 104.0, 106.0, 103.0, 105.0, 12),
    # session B (night): gap up, one bar
    ("2024-01-02 15:00:00", "2024-01-02_N", 110.0, 112.0, 108.0, 111.0, 5),
    # session C (day): gap down below prior close
    ("2024-01-03 09:00:00", "2024-01-03_D", 101.0, 103.0, 100.0, 102.0, 7),
    # session D (night)
    ("2024-01-03 15:00:00", "2024-01-03_N", 102.0, 104.0, 101.0, 103.0, 9),
]


def test_session_ohlc_summary_rolls_to_one_row_per_session(spark):
    s = {
        r["session_id"]: r
        for r in session_ohlc_summary(_bars(spark, _FOUR_SESSIONS)).collect()
    }
    assert len(s) == 4
    a = s["2024-01-02_D"]
    # open of FIRST bar, close of LAST bar, extremes across both.
    assert (a["open"], a["high"], a["low"], a["close"], a["volume"]) == (
        100.0,
        106.0,
        99.0,
        105.0,
        22,
    )


def test_session_atr_first_session_and_window(spark):
    got = {
        r["session_id"]: r
        for r in session_atr(_bars(spark, _FOUR_SESSIONS), n=2).collect()
    }
    # First session: no previous close -> TR = high - low.
    assert got["2024-01-02_D"]["true_range"] == 7.0  # 106 - 99
    # Session B: prev_close=105; TR = max(112-108, |112-105|, |108-105|) = 7.
    assert got["2024-01-02_N"]["true_range"] == 7.0
    # Session C: prev_close=111; TR = max(3, |103-111|, |100-111|) = 11.
    assert got["2024-01-03_D"]["true_range"] == 11.0
    # ATR(2) of session C = mean(TR_B, TR_C) = 9; window capped at n=2.
    assert got["2024-01-03_D"]["atr_2"] == 9.0
    assert got["2024-01-03_D"]["n_in_window"] == 2
    assert got["2024-01-02_D"]["n_in_window"] == 1


def test_overnight_gap_returns_labels_and_values(spark):
    got = {
        r["session_id"]: r
        for r in overnight_gap_returns(_bars(spark, _FOUR_SESSIONS)).collect()
    }
    # First session has no predecessor -> absent.
    assert "2024-01-02_D" not in got
    b = got["2024-01-02_N"]
    assert b["transition"] == "D->N"
    assert b["prev_session_id"] == "2024-01-02_D"
    assert b["session_open"] == 110.0 and b["prev_close"] == 105.0
    assert b["gap_return"] == round(math.log(110.0 / 105.0), 6)
    c = got["2024-01-03_D"]
    assert c["transition"] == "N->D"
    assert c["gap_return"] == round(math.log(101.0 / 111.0), 6)


def test_overnight_gap_guarded_ln_null_on_nonpositive(spark):
    rows = [
        ("2024-01-02 09:00:00", "2024-01-02_D", 10.0, 10.0, 10.0, 10.0, 1),
        # Adjusted open can go non-positive after a large back-shift:
        # the guarded ln must yield NULL, not NaN/-inf.
        ("2024-01-02 15:00:00", "2024-01-02_N", -5.0, 1.0, -5.0, 1.0, 1),
    ]
    got = overnight_gap_returns(_bars(spark, rows)).collect()
    assert len(got) == 1
    assert got[0]["gap_return"] is None


def test_dup_cluster_histogram_conserves_corpus(spark, sf_dir):
    """sum over the histogram of group_size * n_groups must equal the
    corpus row count exactly - every doc is in exactly one group."""
    from txf_continuous_data_pipeline_spark.queries import REGISTRY
    from txf_continuous_data_pipeline_spark.sources import read_table

    hist = REGISTRY["dup_cluster_size_histogram"][0](spark, sf_dir)
    total = hist.agg(F.sum("n_docs").alias("t")).collect()[0]["t"]
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert total == n_docs


def test_fertility_is_volume_weighted_mean_of_doc_fertility(spark, sf_dir):
    """Per-source fertility must equal sum(tokens)/sum(words) of the
    per-doc encode frame - i.e. the source row is the exact weighted
    aggregate of bpe_token_counts, not an unweighted mean of ratios."""
    from txf_continuous_data_pipeline_spark.queries import REGISTRY
    from txf_continuous_data_pipeline_spark.sources import read_table

    per_source = {
        r["source"]: r
        for r in REGISTRY["tokenizer_fertility_by_source"][0](
            spark, sf_dir
        ).collect()
    }
    perdoc = REGISTRY["bpe_token_counts"][0](spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    expected = {
        r["source"]: r
        for r in perdoc.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
        )
        .where(F.col("w") > 0)
        .collect()
    }
    assert set(per_source) == set(expected)
    for src, row in per_source.items():
        e = expected[src]
        assert row["n_words"] == e["w"] and row["n_tokens"] == e["t"]
        assert row["fertility"] == round(e["t"] / e["w"], 6)


def test_price_limit_days_invariants(spark, sf_dir):
    """Flags must agree with the rounded percents they are defined
    over; the up excursion can never be below the down excursion; and
    each contract window loses exactly its FIRST session-contract row
    to the lag (no cross-contract comparison ever happens)."""
    from txf_continuous_data_pipeline_spark.queries import REGISTRY
    from txf_continuous_data_pipeline_spark.queries.timeseries import (
        _session_contract_summary,
    )

    rows = REGISTRY["price_limit_days"][0](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_up_pct"] >= r["max_down_pct"]
        assert r["limit_up_touch"] == (
            r["max_up_pct"] is not None and r["max_up_pct"] >= 0.10
        )
        assert r["limit_down_touch"] == (
            r["max_down_pct"] is not None and r["max_down_pct"] <= -0.10
        )
    sc = _session_contract_summary(spark, sf_dir)
    n_pairs = sc.count()
    n_contracts = sc.select("contract_year_month").distinct().count()
    assert len(rows) == n_pairs - n_contracts


def test_expiry_effect_conserves_session_contracts(spark, sf_dir):
    from pyspark.sql import functions as F2

    from txf_continuous_data_pipeline_spark.queries import REGISTRY
    from txf_continuous_data_pipeline_spark.queries.timeseries import (
        _session_contract_summary,
    )

    rep = REGISTRY["expiry_effect_report"][0](spark, sf_dir)
    total = rep.agg(F2.sum("n_session_contracts").alias("t")).collect()[0][
        "t"
    ]
    assert total == _session_contract_summary(spark, sf_dir).count()
    # the countdown must never be negative: bars beyond settlement
    # belong to the NEXT contract window by construction
    assert rep.where(F2.col("days_to_settle") < 0).count() == 0


def test_dedup_rate_matches_neardup_keep(spark, sf_dir):
    """sum(n_removable) over sources must equal exactly the number of
    docs neardup_keep drops - the two queries share the component
    frame, and the rate datasheet must not disagree with the act."""
    from pyspark.sql import functions as F2

    from txf_continuous_data_pipeline_spark.queries import REGISTRY
    from txf_continuous_data_pipeline_spark.sources import read_table

    rate = REGISTRY["dedup_rate_by_source"][0](spark, sf_dir)
    removed = rate.agg(F2.sum("n_removable").alias("r")).collect()[0]["r"]
    n_docs = read_table(spark, sf_dir, "documents").count()
    kept = REGISTRY["neardup_keep"][0](spark, sf_dir).count()
    assert removed == n_docs - kept


def test_session_vwap_is_partitioning_invariant_on_half_boundary(spark):
    """The r11 verify flake: a vwap whose true quotient sits exactly on
    a 6dp rounding half (74.0578125, from the sf0.01 driver data) used
    to flip its last digit with the double sum's merge order. The
    exact-sum DECIMAL discipline must make the rounded value identical
    under ANY partitioning."""
    from txf_continuous_data_pipeline_spark.operators.returns import (
        session_vwap,
    )

    rows = [
        ("2024-01-19 09:00:00", "2024-01-19_D", 74.0, 74.0, 74.0, 74.0, 32),
        (
            "2024-01-19 09:05:00",
            "2024-01-19_D",
            74.115625,
            74.115625,
            74.115625,
            74.115625,
            32,
        ),
    ]
    # sum(close*volume) = 2368 + 2371.7 = 4739.7; volume = 64;
    # quotient = 74.0578125 - exactly on the 6dp half.
    vals = set()
    for n_parts in (1, 2, 7):
        df = _bars(spark, rows).repartition(n_parts)
        got = session_vwap(df).collect()
        assert len(got) == 1
        vals.add((got[0]["vwap"], got[0]["volume"], got[0]["notional"]))
    assert len(vals) == 1, vals
    (vwap, volume, notional) = vals.pop()
    assert volume == 64 and notional == 4739.7
    # half-away-from-zero at the exact half: 74.0578125 -> .057813,
    # by INTEGER arithmetic on both engines (review wave 2: rounding
    # the quotient double diverges between engines on halves)
    assert vwap == 74.057813


def test_session_vwap_cross_engine_half_case(spark):
    """The review counterexample: exact quotient 8.0000355 (a 6dp
    half whose nearest double sits BELOW the half, so round(double)
    gave 8.000036 on Spark and 8.000035 on DuckDB). The integer
    micro-unit rounding must give half-away = 8.000036, and the
    oracle's identical arithmetic must agree."""
    import duckdb

    from txf_continuous_data_pipeline_spark.operators.returns import (
        session_vwap,
    )

    rows = [
        ("2024-01-19 09:00:00", "S", 8.000035, 8.1, 8.0, 8.000035, 32),
        ("2024-01-19 09:05:00", "S", 8.000036, 8.1, 8.0, 8.000036, 32),
    ]
    got = session_vwap(_bars(spark, rows)).collect()[0]
    assert got["vwap"] == 8.000036
    oracle = duckdb.sql(
        """
        WITH sums AS (
          SELECT sum(CAST(close AS DECIMAL(15,6)) * volume) AS pv,
                 CAST(sum(volume) AS BIGINT) AS volume
          FROM (VALUES (8.000035::DOUBLE, 32), (8.000036::DOUBLE, 32))
               t(close, volume)
        )
        SELECT (CASE WHEN pv < 0 THEN -1 WHEN pv > 0 THEN 1 ELSE 0 END)
                 * ((2 * abs(CAST(pv * 1000000 AS BIGINT)) + volume)
                    // (2 * volume)) / 1000000.0 AS vwap
        FROM sums
        """
    ).fetchone()[0]
    assert oracle == got["vwap"]


def test_order_flow_imbalance_tick_rule_semantics(spark):
    """Hand-checked tick rule on one session: up, down, UNCHANGED
    (carries the down), up - and a first bar that never gets a sign
    (neutral volume). Imbalance = (buy-sell)/(buy+sell) at 6dp."""
    from txf_continuous_data_pipeline_spark.operators.returns import (
        order_flow_imbalance,
    )

    rows = [
        # close path: 100 (no sign) -> 102 (+) -> 101 (-) -> 101
        # (carry -) -> 103 (+)
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 101.0, 99.0, 100.0, 3),
        ("2024-01-02 09:05:00", "2024-01-02_D", 100.0, 102.0, 100.0, 102.0, 10),
        ("2024-01-02 09:10:00", "2024-01-02_D", 102.0, 102.0, 101.0, 101.0, 4),
        ("2024-01-02 09:15:00", "2024-01-02_D", 101.0, 101.0, 100.0, 101.0, 6),
        ("2024-01-02 09:20:00", "2024-01-02_D", 101.0, 104.0, 101.0, 103.0, 2),
    ]
    out = order_flow_imbalance(_bars(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["buy_volume"] == 12          # bars 2 and 5
    assert r["sell_volume"] == 10         # bar 3 plus carried bar 4
    assert r["neutral_volume"] == 3       # the signless first bar
    assert r["n_bars"] == 5
    assert r["flow_imbalance"] == round((12 - 10) / 22, 6)


def test_order_flow_imbalance_null_when_no_signed_bar(spark):
    """A flat session (every close equal) has no signed volume: the
    imbalance quotient is NULL, never a division error or a fake 0."""
    from txf_continuous_data_pipeline_spark.operators.returns import (
        order_flow_imbalance,
    )

    rows = [
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 100.0, 100.0, 100.0, 3),
        ("2024-01-02 09:05:00", "2024-01-02_D", 100.0, 100.0, 100.0, 100.0, 4),
    ]
    r = order_flow_imbalance(_bars(spark, rows)).collect()[0]
    assert r["buy_volume"] == 0 and r["sell_volume"] == 0
    assert r["neutral_volume"] == 7
    assert r["flow_imbalance"] is None


def test_volume_clock_bars_conservation_and_decomposition(spark):
    """Volume bars conserve volume and bar count, bucket ids are the
    exclusive-prefix-sum DIV by construction, and the session-
    decomposed prefix sum equals the global one (sessions are
    time-disjoint, so the planted cross-session cut lands exactly
    where a global cumsum would put it)."""
    from txf_continuous_data_pipeline_spark.operators.resample import (
        volume_clock_bars,
    )

    rows = [
        # total volume 40; target_buckets=4 -> bucket size 10.
        # exclusive cumsum:      0   7  13  25  32
        # bucket = cum DIV 10:   0   0   1   2   3
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 101.0, 99.0, 100.0, 7),
        ("2024-01-02 09:05:00", "2024-01-02_D", 100.0, 103.0, 100.0, 102.0, 6),
        ("2024-01-02 15:00:00", "2024-01-02_N", 102.0, 104.0, 101.0, 103.0, 12),
        ("2024-01-03 09:00:00", "2024-01-03_D", 103.0, 105.0, 102.0, 104.0, 7),
        ("2024-01-03 09:05:00", "2024-01-03_D", 104.0, 106.0, 103.0, 105.0, 8),
    ]
    out = {
        r["vbar_seq"]: r
        for r in volume_clock_bars(
            _bars(spark, rows), target_buckets=4
        ).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    assert sum(r["volume"] for r in out.values()) == 40
    assert sum(r["n_bars"] for r in out.values()) == 5
    # bucket 0 spans the first two day bars; the night bar starts
    # bucket 1 because the SESSION OFFSET carries the day volume over
    b0 = out[0]
    assert b0["n_bars"] == 2 and b0["volume"] == 13
    assert b0["open"] == 100.0 and b0["close"] == 102.0
    assert b0["high"] == 103.0 and b0["low"] == 99.0
    assert out[1]["n_bars"] == 1 and out[1]["volume"] == 12
    assert out[3]["open"] == 104.0 and out[3]["close"] == 105.0


def test_tick_imbalance_bars_cut_rule_semantics(spark):
    """Hand-folded cut rule (total volume 42, target_cuts=5 -> thr=9):
    exact bucket boundaries, tripping bar INCLUSIVE, tail bucket
    emitted, accumulator reset per session, signless opens contribute
    zero, unchanged closes carry the last sign."""
    from txf_continuous_data_pipeline_spark.operators.resample import (
        tick_imbalance_bars,
    )

    rows = [
        # session D: close path 100 (no sign, vol 4) -> 102 (+, vol
        # 10: theta +10 >= 10 TRIP, bucket 0 closes here) -> 101 (-,
        # vol 6: theta -6) -> 103 (+, vol 3: theta -3) -> tail bucket
        # 1 emitted with 3 bars
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 101.0, 99.0, 100.0, 4),
        ("2024-01-02 09:05:00", "2024-01-02_D", 100.0, 102.0, 100.0, 102.0, 10),
        ("2024-01-02 09:10:00", "2024-01-02_D", 102.0, 102.0, 101.0, 101.0, 6),
        ("2024-01-02 09:15:00", "2024-01-02_D", 101.0, 104.0, 101.0, 103.0, 3),
        # session N: fresh accumulator (session scoping); the +12 bar
        # trips on its own; 105 -> 105 carries the + sign into the
        # tail (vol 5, theta 5, no trip)
        ("2024-01-02 15:00:00", "2024-01-02_N", 103.0, 105.0, 103.0, 104.0, 2),
        ("2024-01-02 15:05:00", "2024-01-02_N", 104.0, 106.0, 104.0, 105.0, 12),
        ("2024-01-02 15:10:00", "2024-01-02_N", 105.0, 105.0, 104.0, 105.0, 5),
    ]
    # thr = ceil(42/5) = 9. D walk: theta 0 (signless open), +10 >= 9
    # TRIP; then -6, -3 tail. N walk: 0 (signless), +12 >= 9 TRIP;
    # +5 tail.
    out = {
        (r["session_id"], r["ibar_seq"]): r
        for r in tick_imbalance_bars(
            _bars(spark, rows), target_cuts=5
        ).collect()
    }
    assert sorted(out) == [
        ("2024-01-02_D", 0),
        ("2024-01-02_D", 1),
        ("2024-01-02_N", 0),
        ("2024-01-02_N", 1),
    ]
    d0 = out[("2024-01-02_D", 0)]
    # tripping bar INCLUSIVE: bucket 0 holds the signless open AND
    # the +10 bar that tripped
    assert d0["n_bars"] == 2 and d0["volume"] == 14
    assert d0["signed_volume"] == 10  # signless open contributes 0
    assert d0["open"] == 100.0 and d0["close"] == 102.0
    d1 = out[("2024-01-02_D", 1)]
    assert d1["n_bars"] == 2 and d1["signed_volume"] == -3
    assert d1["high"] == 104.0 and d1["low"] == 101.0
    n0 = out[("2024-01-02_N", 0)]
    # session scoping: N's accumulator starts at 0 despite D's tail
    assert n0["n_bars"] == 2 and n0["signed_volume"] == 12
    n1 = out[("2024-01-02_N", 1)]
    # unchanged close carries the + sign into the tail bucket
    assert n1["n_bars"] == 1 and n1["signed_volume"] == 5


def test_session_liquidity_metrics_hand_computed(spark):
    """Amihud / Kyle / Roll on one hand-walked session: adjusted
    closes 100(v4) 102(v10) 101(v6) 101(v6) 103(v2) with a +50
    planted offset (raw = close - 50); dp = -,2,-1,0,2; signed
    volume = 0,10,-6,-6,2 (unchanged close carries the -). Amihud's
    notional must use the RAW closes (review finding: notional is a
    property of the trade, not the splice); Kyle/Roll use dp, which
    is splice-invariant. Plus a monotone session whose serial cov is
    exactly 0: Roll is NULL (no bounce, no estimate), never 0.0."""
    import math

    from txf_continuous_data_pipeline_spark.operators.returns import (
        session_liquidity_metrics,
    )

    rows = [
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 101.0, 99.0, 100.0, 4),
        ("2024-01-02 09:05:00", "2024-01-02_D", 100.0, 102.0, 100.0, 102.0, 10),
        ("2024-01-02 09:10:00", "2024-01-02_D", 102.0, 102.0, 101.0, 101.0, 6),
        ("2024-01-02 09:15:00", "2024-01-02_D", 101.0, 101.0, 100.0, 101.0, 6),
        ("2024-01-02 09:20:00", "2024-01-02_D", 101.0, 104.0, 101.0, 103.0, 2),
        # monotone night session: dp = 1,1,1 -> cov(dp, dp_lag) == 0
        ("2024-01-02 15:00:00", "2024-01-02_N", 100.0, 101.0, 100.0, 100.0, 3),
        ("2024-01-02 15:05:00", "2024-01-02_N", 100.0, 101.0, 100.0, 101.0, 3),
        ("2024-01-02 15:10:00", "2024-01-02_N", 101.0, 102.0, 101.0, 102.0, 3),
        ("2024-01-02 15:15:00", "2024-01-02_N", 102.0, 103.0, 102.0, 103.0, 3),
    ]
    planted = _bars(spark, rows).withColumn(
        "accumulated_contract_diff", F.lit(50.0)
    )
    out = {
        r["session_id"]: r
        for r in session_liquidity_metrics(planted).collect()
    }
    d = out["2024-01-02_D"]
    assert d["n_price_changes"] == 4
    # raw closes 52, 51, 51, 53 on the signed bars
    amihud = 1e6 * (2 / 520 + 1 / 306 + 0.0 + 2 / 106) / 4
    assert abs(d["amihud_1e6"] - amihud) < 1e-5
    # kyle: sum(dp*sv) = 20 + 6 + 0 + 4 = 30; sum(sv^2) = 176
    assert abs(d["kyle_lambda"] - 30 / 176) < 1e-5
    # roll: pairs (-1,2) (0,-1) (2,0): cov = -2/3 - (1/3)(1/3)
    cov = -2 / 3 - (1 / 3) * (1 / 3)
    assert abs(d["roll_spread"] - 2 * math.sqrt(-cov)) < 1e-5
    n = out["2024-01-02_N"]
    assert n["n_price_changes"] == 3
    assert n["roll_spread"] is None  # cov == 0: no estimate, not 0.0
    # monotone upticks: kyle = (1*3 + 1*3 + 1*3) / (9*3) = 1/3
    assert abs(n["kyle_lambda"] - 1 / 3) < 1e-5


def test_dollar_clock_bars_runs_on_raw_notional(spark):
    """The dollar clock cuts on RAW notional: with the adjustment
    offset planted at +50, weights must come from close-50, not the
    adjusted close - and an expensive bar consumes more clock than an
    equal-volume cheap bar. Conservation holds."""
    from txf_continuous_data_pipeline_spark.operators.resample import (
        dollar_clock_bars,
    )

    rows = [
        # raw closes 50 and 150 (adjusted 100/200), equal volume 10:
        # weights 50*1e4*10 = 5e6 and 150*1e4*10 = 1.5e7; total 2e7.
        # target_buckets=4 -> bucket 5e6. exclusive cumsum: 0, 5e6 ->
        # bar1 cuts into bucket 0, bar2 into bucket 1.
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 101.0, 99.0, 100.0, 10),
        ("2024-01-02 09:05:00", "2024-01-02_D", 200.0, 201.0, 199.0, 200.0, 10),
    ]
    bars = _bars(spark, rows).withColumn(
        "accumulated_contract_diff", F.lit(50.0)
    )
    out = {
        r["dbar_seq"]: r
        for r in dollar_clock_bars(bars, target_buckets=4).collect()
    }
    assert sorted(out) == [0, 1]
    assert out[0]["volume"] == 10 and out[1]["volume"] == 10
    assert out[0]["close"] == 100.0 and out[1]["close"] == 200.0
    # 3-bar frame: raw weights 5e6, 1.5e7, 1.5e7 -> total 3.5e7,
    # bucket ceil(/4) = 8.75e6; exclusive cums 0, 5e6, 2e7 -> buckets
    # 0, 0, 2 (the middle bucket 1 is legitimately empty: the heavy
    # second bar's weight spans it). Conservation + exact cut points.
    rows3 = rows + [
        ("2024-01-02 09:10:00", "2024-01-02_D", 200.0, 201.0, 199.0, 200.0, 10),
    ]
    bars3 = _bars(spark, rows3).withColumn(
        "accumulated_contract_diff", F.lit(50.0)
    )
    out3 = dollar_clock_bars(bars3, target_buckets=4).collect()
    assert sum(r["volume"] for r in out3) == 30
    assert sum(r["n_bars"] for r in out3) == 3
    assert sorted(r["dbar_seq"] for r in out3) == [0, 2]


def test_clock_bars_reject_nonpositive_fixed_threshold(spark):
    """bucket_volume=0 must fail fast, not silently NULL every bucket
    id under non-ANSI DIV-by-zero (review finding)."""
    import pytest

    from txf_continuous_data_pipeline_spark.operators.resample import (
        volume_clock_bars,
    )

    rows = [
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 101.0, 99.0, 100.0, 4),
    ]
    with pytest.raises(ValueError, match="positive"):
        volume_clock_bars(_bars(spark, rows), bucket_volume=0)
    with pytest.raises(ValueError, match="positive"):
        volume_clock_bars(_bars(spark, rows), bucket_volume=-5)


def test_clock_bars_zero_total_weight_single_bucket(spark):
    """Derived-threshold twin of the fixed-threshold guard (r11
    advice): an all-zero-volume frame gives total weight 0, so
    ceil(0/target) = 0 and non-ANSI DIV 0 would silently NULL every
    bucket id, collapsing output into one null-keyed row. The
    greatest(.,1) guard instead lands everything in bucket 0 - a
    well-keyed degenerate, and the ONLY case the guard changes."""
    from txf_continuous_data_pipeline_spark.operators.resample import (
        volume_clock_bars,
    )

    rows = [
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 101.0, 99.0, 100.0, 0),
        ("2024-01-02 09:05:00", "2024-01-02_D", 100.0, 103.0, 100.0, 102.0, 0),
        ("2024-01-02 15:00:00", "2024-01-02_N", 102.0, 104.0, 101.0, 103.0, 0),
    ]
    out = volume_clock_bars(_bars(spark, rows), target_buckets=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["vbar_seq"] == 0 and r["vbar_seq"] is not None
    assert r["n_bars"] == 3 and r["volume"] == 0
    assert r["open"] == 100.0 and r["close"] == 103.0


def test_overnight_gap_zero_prev_close_is_null_not_inf(spark):
    """r11 advice: a back-shift can push an adjusted close to exactly
    0.0. Spark's non-ANSI division NULLs while DuckDB's IEEE division
    yields inf, so without the nullif guard gap_return could print
    NULL on one engine and inf on the other. Guarded: NULL on both."""
    rows = [
        ("2024-01-02 09:00:00", "2024-01-02_D", 100.0, 105.0, -1.0, 0.0, 10),
        ("2024-01-02 15:00:00", "2024-01-02_N", 110.0, 112.0, 108.0, 111.0, 5),
    ]
    out = overnight_gap_returns(_bars(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["prev_close"] == 0.0
    assert out[0]["gap_return"] is None
