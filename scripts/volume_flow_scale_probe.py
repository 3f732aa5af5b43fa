"""Scale probe for the late-r11 microstructure additions:
volume_clock_bars and order_flow_imbalance at 1x vs Nx derived events
(the r11_scale_probe replication convention: events grow by TIME
SHIFT, so session structure scales like longer history).

Expectations (plan citations in the operators):
  volume_clock_bars     session-partitioned exclusive prefix sum (one
                        hash exchange on session_id) + dimension-sized
                        session-offset window + broadcast joins + one
                        map-side-combined aggregate -> ~linear. The
                        bucket COUNT stays ~target_buckets by
                        construction (the threshold scales with total
                        volume), so the output is dimension-sized at
                        any corpus size.
  order_flow_imbalance  two session-partitioned windows sharing one
                        sort + one map-side-combined aggregate ->
                        ~linear, embarrassingly parallel across
                        sessions.
  tick_imbalance_bars   the sequential cut fold is session-scoped and
                        a session is physically bounded (<= 168
                        bars), so the applyInPandas is O(session) per
                        group, parallel across sessions -> ~linear in
                        sessions; only bucket rows leave Python.

Usage: python scripts/volume_flow_scale_probe.py [replicas]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from r11_scale_probe import SF_DIR, adjusted_bars, events_big

from txf_continuous_data_pipeline_spark.operators.resample import (
    dollar_clock_bars,
    tick_imbalance_bars,
    volume_clock_bars,
)
from txf_continuous_data_pipeline_spark.operators.returns import (
    order_flow_imbalance,
    session_liquidity_metrics,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table


def _t(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("volume_flow_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replicas": reps}

    ev1 = (
        read_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "value")
        .localCheckpoint(eager=True)
    )
    evN = events_big(spark, ev1, reps)

    for tag, ev in (("1x", ev1), (f"{reps}x", evN)):
        bars = adjusted_bars(ev).localCheckpoint(eager=True)
        w, n = _t(
            lambda: volume_clock_bars(bars, target_buckets=200).count()
        )
        out[f"volume_clock_bars_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(lambda: order_flow_imbalance(bars).count())
        out[f"order_flow_imbalance_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(
            lambda: tick_imbalance_bars(bars, target_cuts=800).count()
        )
        out[f"tick_imbalance_bars_{tag}"] = {"wall_s": w, "rows": n}
        w, n = _t(lambda: session_liquidity_metrics(bars).count())
        out[f"session_liquidity_metrics_{tag}"] = {
            "wall_s": w, "rows": n,
        }
        w, n = _t(
            lambda: dollar_clock_bars(bars, target_buckets=200).count()
        )
        out[f"dollar_clock_bars_{tag}"] = {"wall_s": w, "rows": n}

    for op in (
        "volume_clock_bars",
        "order_flow_imbalance",
        "tick_imbalance_bars",
        "session_liquidity_metrics",
        "dollar_clock_bars",
    ):
        a = out[f"{op}_1x"]["wall_s"] or 0.01
        b = out[f"{op}_{reps}x"]["wall_s"]
        out[f"{op}_growth"] = round(b / a, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
