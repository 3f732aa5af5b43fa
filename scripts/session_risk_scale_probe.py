"""Scale probe for the late-r11 session-risk family + corpus
datasheets (the VERDICT r10 #6 discipline: everything that lands
after a probe wave gets its own measured 10x exponents).

Replication axes are the r11_scale_probe ones (imported, not copied):
events 10x by +35-day time shift, docs 10x by token-prefix replicas.

Expectations under test:
  session_atr            bar-scale work is ONE map-side rollup to the
                         session summary; the lag + rolling windows
                         run on one row per session -> ~linear scan,
                         window cost grows with SESSIONS not bars.
  overnight_gap_returns  same rollup + one lag -> ~linear.
  volume_anomaly         same rollup + two window aggs -> ~linear.
  fertility_by_source    trainer touches the distinct-token vocab;
                         encode is vocab-amortized; the corpus-scale
                         work is one token groupBy -> ~linear.
  dup_histogram_stage    the stages the histogram ADDS on top of
                         neardup_groups (whose 10x growth SCALE.md
                         already records): component-size agg + the
                         singleton anti-join -> ~linear in docs.

Usage: python scripts/session_risk_scale_probe.py [replicas]
"""

from __future__ import annotations

import importlib.util
import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.returns import (
    overnight_gap_returns,
    session_atr,
    session_ohlc_summary,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table

_spec = importlib.util.spec_from_file_location(
    "r11_scale_probe", "/root/repo/scripts/r11_scale_probe.py"
)
_r11 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_r11)

SF_DIR = _r11.SF_DIR


def vol_anomaly(bars):
    from pyspark.sql import Window

    summ = session_ohlc_summary(bars)
    w = Window.orderBy("session_start").rowsBetween(-20, -1)
    vol = F.col("volume").cast("double")
    return summ.select(
        "session_id",
        F.avg(vol).over(w).alias("mu"),
        F.stddev_samp(vol).over(w).alias("sigma"),
    )


def fertility(docs):
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        bpe_encode_counts,
        bpe_train,
    )

    merges = bpe_train(docs, n_merges=10)
    return (
        bpe_encode_counts(docs, merges)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_words").alias("w"),
            F.sum("n_bpe_tokens").alias("t"),
        )
    )


def hist_stage(docs, comp):
    """Only the stages dup_cluster_size_histogram ADDS beyond the
    already-probed neardup pair/CC build."""
    sizes = comp.groupBy("component").agg(F.count("*").alias("gs"))
    singles = docs.select("doc_id").join(
        F.broadcast(comp.select(F.col("id").alias("doc_id"))),
        "doc_id",
        "left_anti",
    ).select(F.lit(1).alias("gs"))
    return (
        sizes.select("gs")
        .unionByName(singles)
        .groupBy("gs")
        .agg(F.count("*").alias("n"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("session_risk_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replicas": reps}

    ev1 = (
        read_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "value")
        .localCheckpoint(eager=True)
    )
    evN = _r11.events_big(spark, ev1, reps)
    for tag, ev in (("1x", ev1), (f"{reps}x", evN)):
        bars = _r11.adjusted_bars(ev).localCheckpoint(eager=True)
        w, n = _r11._t(lambda: session_atr(bars, n=14).count())
        out[f"session_atr_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _r11._t(lambda: overnight_gap_returns(bars).count())
        out[f"overnight_gap_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _r11._t(lambda: vol_anomaly(bars).count())
        out[f"vol_anomaly_{tag}"] = {"wall_s": w, "rows": n}

    docs1 = read_table(spark, SF_DIR, "documents").localCheckpoint(
        eager=True
    )
    docsN = _r11.docs_big(spark, docs1, reps)
    for tag, docs in (("1x", docs1), (f"{reps}x", docsN)):
        w, n = _r11._t(lambda: fertility(docs).count())
        out[f"fertility_{tag}"] = {"wall_s": w, "rows": n}
        # synthetic comp: 10% of docs clustered in groups of ~4 - the
        # added-stage cost axis is corpus size (anti-join) + dup count
        comp = (
            docs.select("doc_id")
            .where(F.col("doc_id") % 10 == 0)
            .select(
                F.col("doc_id").alias("id"),
                (F.floor(F.col("doc_id") / 40) * 40).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        w, n = _r11._t(lambda: hist_stage(docs, comp).count())
        out[f"dup_hist_stage_{tag}"] = {"wall_s": w, "rows": n}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
