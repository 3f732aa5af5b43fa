"""Scale probe for the r10/r11 additions (VERDICT r10 #6): operators
that landed after the late_scale_probe wave get measured 10x growth
exponents like their siblings in SCALE.md. Nothing is written to
/root/testdata; derived corpora live in tmp / in-memory.

Replication axes:
  events  10x by TIME SHIFT (each replica +35 days, past the 30-day
          base range) - session structure, bar density, and the
          weekly-config dimension all scale with the corpus the way a
          longer trading history would, instead of densifying the same
          30 days.
  docs    10x by the per-replica token-prefix trick (disjoint shingle
          sets keep near-dup density at the baseline's).
  emb     10x by id remap (the _rep_frame trick).

Expectations under test (plan citations in each probe fn):
  continuous_returns        session-partitioned lag -> ~linear; the
                            cross-session stitch is a dimension-sized
                            window (sessions, not bars).
  session_realized_vol      + one map-side-combined agg -> ~linear.
  missing_bars_report       grid gen + distinct + anti-join -> ~linear.
  session_gap_stats         + window over the MISSING frame (dimension
                            -sized) -> ~linear.
  intraday_volume_profile   zero-shuffle slot projection + fixed-key
                            agg (<=288 slots) -> ~linear scan cost.
  training_mix_pack         broadcast rate dim + md5 keep predicate +
                            one shard-key window -> ~linear.
  compact_batch_store       rollup reads+rewrites the store once ->
                            ~linear in store bytes.
  restate_adjusted_history  bounded by the REVISION's date span, not
                            the sink: a fixed tail revision on a 10x
                            sink must be ~FLAT (the headline claim;
                            an early-contract revision legitimately
                            touches everything after it - that history
                            really is stale - and costs accordingly).
  retrain_ivfpq_index       sample-capped fit (flat) + one distributed
                            re-encode (linear) -> ~linear, shallow.

Usage: python scripts/r11_scale_probe.py [replicas] [tmp_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.adjust import (
    backadjust,
    restate_adjusted_history,
)
from txf_continuous_data_pipeline_spark.operators.quality import (
    EXPECTED_5MIN,
    drop_open_session,
)
from txf_continuous_data_pipeline_spark.operators.resample import (
    tumbling_ohlcv,
)
from txf_continuous_data_pipeline_spark.operators.returns import (
    continuous_log_returns,
    session_realized_vol,
)
from txf_continuous_data_pipeline_spark.operators.sessions import (
    split_and_label,
)
from txf_continuous_data_pipeline_spark.plans.pipeline import (
    weekly_settle_config,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.sources.io import (
    write_date_partitioned,
)

SF_DIR = "/root/testdata/sf0.1"


def _t(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def events_big(spark, events, reps):
    r = spark.range(reps).select(F.col("id").alias("rep"))
    return (
        events.crossJoin(r)
        .select(
            (F.col("event_id") * reps + F.col("rep")).alias("event_id"),
            F.timestamp_add(
                "DAY", (F.col("rep") * 35).cast("int"), F.col("ts")
            ).alias("ts"),
            "value",
        )
        .localCheckpoint(eager=True)
    )


def docs_big(spark, docs, reps):
    """10x docs by the per-replica token-prefix trick: disjoint
    shingle sets keep near-dup density at the baseline's. THE
    document replica convention - the session_risk probe imports this
    so both probes measure the same derived corpus."""
    r = spark.range(reps).select(F.col("id").alias("rep"))
    rep_s = F.col("rep").cast("string")
    return (
        docs.crossJoin(r)
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            "source",
            "lang",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(rep_s, F.lit("_"), t),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def adjusted_bars(events):
    """bar_pipeline_5m's stage chain over an arbitrary events frame
    (plans/pipeline.py), UNKNOWN filtered like continuous_returns_q."""
    bars = tumbling_ohlcv(
        events, ts_col="ts", price_col="value", width="5 minutes",
        closed="right", out_ts="bar_ts",
    ).drop("n_rows")
    labeled = split_and_label(bars, "bar_ts")
    adj = backadjust(
        labeled, weekly_settle_config(events), ts_col="bar_ts",
        end_inclusive=False,
    )
    gated = drop_open_session(
        adj, EXPECTED_5MIN, session_col="session_id", ts_col="bar_ts"
    )
    return gated.where(
        F.substring_index(F.col("session_id"), "_", -1) != "UNKNOWN"
    )


def missing_bars(events):
    """missing_bars_report's plan (queries/timeseries.py)."""
    labeled = split_and_label(events)
    sess = (
        labeled.select(
            F.substring_index(F.col("session_id"), "_", 1).alias(
                "sess_date"
            ),
            F.substring_index(F.col("session_id"), "_", -1).alias("kind"),
        )
        .where(F.col("kind").isin("D", "N"))
        .distinct()
    )
    start = F.to_timestamp(
        F.concat(
            F.col("sess_date"),
            F.when(F.col("kind") == "D", F.lit(" 08:45:00")).otherwise(
                F.lit(" 15:00:00")
            ),
        )
    )
    end = F.when(
        F.col("kind") == "D", start + F.expr("INTERVAL 4 HOURS 55 MINUTES")
    ).otherwise(start + F.expr("INTERVAL 13 HOURS 55 MINUTES"))
    grid = sess.select(
        F.concat_ws("_", "sess_date", "kind").alias("session_id"),
        F.explode(
            F.sequence(start, end, F.expr("INTERVAL 5 MINUTES"))
        ).alias("bar_ts"),
    )
    observed = labeled.select(
        F.timestamp_micros(
            (
                F.floor((F.unix_micros(F.col("ts")) - 1) / 300000000.0)
                * 300000000
            ).cast("long")
        ).alias("bar_ts")
    ).distinct()
    return grid.join(observed, "bar_ts", "left_anti").select(
        "session_id", "bar_ts"
    )


def gap_stats(events):
    """session_gap_stats' window over the missing frame."""
    from pyspark.sql import Window

    missing = missing_bars(events)
    w = Window.partitionBy("session_id").orderBy("bar_ts")
    grp = F.col("bar_ts").cast("long") - F.row_number().over(w) * 300
    islands = (
        missing.withColumn("grp", grp)
        .groupBy("session_id", "grp")
        .agg(F.count("*").cast("long").alias("run_len"))
    )
    return islands.groupBy("session_id").agg(
        F.sum("run_len").cast("long").alias("n_missing"),
        F.max("run_len").cast("long").alias("longest_gap_bars"),
        F.count("*").cast("long").alias("n_gap_runs"),
    )


def vol_profile(events):
    """intraday_volume_profile's plan (queries/timeseries.py)."""
    labeled = split_and_label(events)
    slot_ts = F.timestamp_micros(
        (
            F.floor((F.unix_micros(F.col("ts")) - 1) / 300000000.0)
            * 300000000
        ).cast("long")
    )
    slotted = labeled.select(
        F.substring_index(F.col("session_id"), "_", -1).alias("kind"),
        F.substring_index(F.col("session_id"), "_", 1).alias("sess_date"),
        F.date_format(slot_ts, "HH:mm").alias("slot"),
        "value",
    ).where(F.col("kind").isin("D", "N"))
    per_kind = slotted.groupBy("kind").agg(
        F.countDistinct("sess_date").cast("long").alias("n_sessions")
    )
    return (
        slotted.groupBy("kind", "slot")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("_v"))
        .join(F.broadcast(per_kind), "kind")
    )


def mix_pack(docs):
    """training_mix_pack's stage chain (queries/text.py)."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        mixture_sample,
        pack_sequences,
    )
    from txf_continuous_data_pipeline_spark.queries.text import (
        _mixture_weight,
    )

    kept_ids = mixture_sample(
        docs, weight=_mixture_weight(), budget_tokens=12000
    ).select("doc_id")
    kept_docs = docs.join(kept_ids, "doc_id", "left_semi")
    packed = pack_sequences(kept_docs, seq_tokens=256)
    seqs = F.ceil(F.sum("n_tokens") / F.lit(256.0)).cast("long")
    return packed.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        seqs.alias("n_sequences"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tmp = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="r11_probe_"
    )
    spark = get_spark("r11_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replicas": reps}

    ev1 = (
        read_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "value")
        .localCheckpoint(eager=True)
    )
    evN = events_big(spark, ev1, reps)

    for tag, ev in (("1x", ev1), (f"{reps}x", evN)):
        # ONE checkpointed bar build per corpus serves every bar-chain
        # probe below (r11 review wave 3: the late additions had
        # re-derived it in a second loop)
        bars = adjusted_bars(ev).localCheckpoint(eager=True)
        w, n = _t(lambda: continuous_log_returns(bars).count())
        out[f"continuous_returns_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(
            lambda: session_realized_vol(
                continuous_log_returns(bars)
            ).count()
        )
        out[f"session_realized_vol_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(lambda: missing_bars(ev).count())
        out[f"missing_bars_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(lambda: gap_stats(ev).count())
        out[f"gap_stats_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(lambda: vol_profile(ev).count())
        out[f"vol_profile_{tag}"] = {"wall_s": w, "rows": n}

        pv = F.col("close") * F.col("volume")
        w, n = _t(
            lambda: bars.groupBy("session_id")
            .agg((F.sum(pv) / F.sum("volume")).alias("vwap"))
            .count()
        )
        out[f"session_vwap_{tag}"] = {"wall_s": w, "rows": n}
        cfg = weekly_settle_config(ev)
        last = (
            cfg.orderBy(F.col("start_k").desc())
            .limit(1)
            .select(
                F.col("accumulated_contract_diff").alias("last_acc")
            )
        )
        w, n = _t(
            lambda: bars.where(F.col("contract_year_month") != "")
            .crossJoin(F.broadcast(last))
            .select((F.col("close") - F.col("last_acc")).alias("f"))
            .count()
        )
        out[f"forward_adjust_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(
            lambda: bars.where(F.col("contract_year_month") != "")
            .join(
                F.broadcast(
                    cfg.select("contract_year_month", "settle_k")
                ),
                "contract_year_month",
            )
            .groupBy(
                "contract_year_month",
                F.substring(F.col("session_id"), 1, 10).alias("d"),
            )
            .agg(F.sum("volume").alias("v"))
            .count()
        )
        out[f"roll_calendar_{tag}"] = {"wall_s": w, "rows": n}

    docs = read_table(spark, SF_DIR, "documents").localCheckpoint(
        eager=True
    )
    big = docs_big(spark, docs, reps)
    w, n = _t(lambda: mix_pack(docs).count())
    out["mix_pack_1x"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: mix_pack(big).count())
    out[f"mix_pack_{reps}x"] = {"wall_s": w, "rows": n}

    # compact_batch_store: store bytes 1x vs replicas-x (same batch
    # count - the rollup cost axis is bytes, not dir count)
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        compact_batch_store,
    )

    for tag, mult in (("1x", 1), (f"{reps}x", reps)):
        store = os.path.join(tmp, f"store_{tag}")
        base_rows = spark.range(20_000 * mult).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        for b in range(8):
            base_rows.where(F.col("k") % 8 == b).write.parquet(
                os.path.join(store, f"batch={b}")
            )
        w, n = _t(lambda: compact_batch_store(spark, store, 6))
        out[f"compact_{tag}"] = {"wall_s": w, "dirs_rolled": n}

    # restate_adjusted_history: fixed TAIL revision on a growing sink
    # must be ~flat (scan bounded by the revision's date span)
    for tag, ev in (("1x", ev1), (f"{reps}x", evN)):
        cfg = weekly_settle_config(ev).localCheckpoint(eager=True)
        sink = os.path.join(tmp, f"sink_{tag}")
        bars = tumbling_ohlcv(
            ev, ts_col="ts", price_col="value", width="5 minutes",
            closed="right", out_ts="bar_ts",
        ).drop("n_rows")
        sunk = backadjust(
            bars, cfg, ts_col="bar_ts", end_inclusive=False
        )
        write_date_partitioned(sunk, sink, ts_col="bar_ts")
        target = cfg.agg(
            F.max("start_k") - F.expr("INTERVAL 7 DAYS")
        ).collect()[0][0]
        new_cfg = cfg.withColumn(
            "next_contract_diff",
            F.col("next_contract_diff")
            + F.when(F.col("start_k") == F.lit(target), 5.0).otherwise(
                0.0
            ),
        )
        w, st = _t(
            lambda: restate_adjusted_history(
                spark, sink, cfg, new_cfg, ts_col="bar_ts",
                end_inclusive=False,
            )
        )
        out[f"restate_tail_{tag}"] = {"wall_s": w, **st}

    # retrain_ivfpq_index: corpus 1x vs replicas-x
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        retrain_ivfpq_index,
        write_ivfpq_index,
    )
    from txf_continuous_data_pipeline_spark.queries.similarity import (
        _fixed_centroids,
        _pq_seed_codebook,
        _PQ_M,
    )

    emb = read_table(spark, SF_DIR, "embeddings").localCheckpoint(
        eager=True
    )
    emb_big = (
        emb.crossJoin(r)
        .select(
            (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )
    cb = _pq_seed_codebook(spark, SF_DIR)
    for tag, frame in (("1x", emb), (f"{reps}x", emb_big)):
        idx = os.path.join(tmp, f"ivfpq_{tag}")
        write_ivfpq_index(frame, _fixed_centroids(), cb, idx, m=_PQ_M)
        w, res = _t(
            lambda: retrain_ivfpq_index(
                spark, idx, cb, m=_PQ_M, n_cells=4
            )
        )
        out[f"retrain_{tag}"] = {
            "wall_s": w,
            "skew_after": round(res[1]["skew"], 3),
            "rows": sum(res[1]["cell_sizes"].values()),
        }

    print(json.dumps(out, indent=2))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
