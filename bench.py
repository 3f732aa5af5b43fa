"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf"}.

Each query is fully materialized through the `noop` datasource writer -
whole plan executes, nothing funnels into the driver, so the number
measures engine throughput, not a collect() bottleneck.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from txf_continuous_data_pipeline_spark.queries import REGISTRY
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources.io import timestamp_flavors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # Testdata drift tripwire (round-3 lesson: the driver silently
    # regenerated /root/testdata with a different parquet timestamp
    # flavor and six queries crashed before any timing). read_table
    # normalizes every flavor; this manifest makes the NEXT flavor
    # change a visible diff line instead of a surprise.
    print(json.dumps({"ts_flavors": timestamp_flavors(sf_dir)}))
    # UI on for the REST status API: per-query shuffle_read_mb/n_tasks
    # are DETERMINISTIC under the host's 2-6x wall-clock swings, so a
    # future "regression" adjudicates itself — flat bytes + inflated
    # wall = throttle, moved bytes = real (r13 verdict #3; BASELINE.md
    # adjudication rule cites these columns).
    spark = get_spark(
        "txf_bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "600",
            "spark.ui.retainedJobs": "600",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl

    def _stage_snapshot() -> dict:
        """(stageId, attemptId) -> completed-stage record via the REST
        status API; {} when the UI is unreachable (metrics then simply
        omit that query — never fail the bench over observability)."""
        try:
            apps = json.load(
                urllib.request.urlopen(
                    f"{ui_url}/api/v1/applications", timeout=10
                )
            )
            data = json.load(
                urllib.request.urlopen(
                    f"{ui_url}/api/v1/applications/{apps[0]['id']}"
                    "/stages?status=complete",
                    timeout=10,
                )
            )
            return {(s["stageId"], s["attemptId"]): s for s in data}
        except Exception:  # noqa: BLE001 - observability, not correctness
            return {}

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch classloading. bar_pipeline_5m touches
    # the broad machinery (window agg, createDataFrame dims, broadcast
    # exchange) a bare scan query would leave cold. Warm-up failures
    # are non-fatal: a broken warm query costs accuracy, not the run
    # (round-3 lesson: one analysis-time crash here zeroed EVERY
    # timing for the round).
    for warm in ("ohlcv_5m", "bar_pipeline_5m"):
        try:
            REGISTRY[warm][0](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 - reported, not hidden
            print(json.dumps({"warmup_error": f"{warm}: {e}"[:300]}))
    # ... and the Python-worker/Arrow lane: the first pandas-UDF stage
    # in a session pays ~3s of worker spawn + Arrow serde init, which
    # otherwise lands on whichever similarity/dedup query runs first.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm_arrow(v):
        # import numpy inside the worker: every real pandas-UDF stage
        # uses it, and the per-worker import otherwise lands on the
        # first multimodal/similarity query's timing
        import numpy as _np  # noqa: F401

        return v * 1.0

    spark.range(32 * 64).select(
        _warm_arrow(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    # Per-query isolation: one failing query records an error and the
    # other ~92 still get timed (a single exception previously killed
    # the whole bench with zero timings).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    shuffle_mb: dict[str, float] = {}
    n_tasks: dict[str, int] = {}
    before = _stage_snapshot()
    for name, (fn, _) in REGISTRY.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 - reported per query
            errors[name] = str(e)[:200]
        after = _stage_snapshot()
        new = [s for k, s in after.items() if k not in before]
        if after:
            shuffle_mb[name] = round(
                sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 1
            )
            n_tasks[name] = sum(s.get("numTasks", 0) for s in new)
        before = after

    total = round(sum(timings.values()), 3)
    # The driver captures only the LAST ~2000 chars of stdout and
    # json-parses the final line; a 92-query dict is ~2.4k chars, so it
    # can never fit whole (BENCH_r02 lost its total to front
    # truncation). The COMPLETE per-query detail therefore goes to a
    # committed repo file every run — that is the public record — and
    # the stdout line keeps the slowest queries plus the total, trimmed
    # to fit the capture window, with a pointer to the detail file.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # Keep a short rolling HISTORY of runs (latest last): the measured
    # 2-3x multi-tenant host variance means a single sample cannot
    # attribute a per-query regression; two-plus samples per round
    # bound it (the r5 kmeans_clusters "2x regression" was variance).
    # Top-level fields still describe the LATEST run for readers of the
    # old shape.
    # BASELINE.md r11 amendment: the regression bar is PER-QUERY
    # (<= 1.80 s/q, r01's own cost); surface it directly so the bar as
    # written is the number in the record.
    per_query = round(total / len(timings), 3) if timings else 0.0
    this_run = {
        "metric": "total_registry_runtime",
        "value": total,
        "unit": "sec",
        "per_query_sec": per_query,
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "n_queries": len(timings),
        "wall_clock_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        ),
        "queries": timings,
        # deterministic scale signals next to the wall time (r13
        # verdict #3): flat bytes + inflated wall = host throttle,
        # moved bytes = a real plan change
        "shuffle_read_mb": shuffle_mb,
        "n_tasks": n_tasks,
        **({"errors": errors} if errors else {}),
    }
    carry: dict = {}
    try:
        with open(detail_path) as f:
            old = json.load(f)
        # hand-recorded A/B investigations survive the rewrite
        if "ab_checks" in old:
            carry["ab_checks"] = old["ab_checks"]
    except (OSError, ValueError):
        pass
    # BENCH_DETAIL.json = the LATEST run only (+ the ab_checks archive);
    # history appends one line per sample to BENCH_DETAIL.jsonl so each
    # bench run is a one-line diff, not a 1,000-line rewrite (r13
    # verdict #6).
    with open(detail_path, "w") as f:
        json.dump({**this_run, **carry}, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(detail_path.replace(".json", ".jsonl"), "a") as f:
        f.write(json.dumps(this_run, sort_keys=True) + "\n")
    print(json.dumps({"queries_detail": timings, "sf": sf}))
    if errors:
        print(json.dumps({"errors": errors}))

    budget = 1900
    kept = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    )

    def _line(qs: dict[str, float], omitted: int) -> str:
        payload: dict = {"queries": {k: round(v, 2) for k, v in qs.items()}}
        if errors:
            payload["errors"] = len(errors)
        if omitted:
            payload["omitted"] = omitted
            payload["full_detail"] = "BENCH_DETAIL.json"
        payload.update(
            sf=sf,
            unit="sec",
            metric="total_registry_runtime",
            value=total,
            per_query_sec=per_query,
            n_queries=len(timings),
        )
        return json.dumps(payload, separators=(",", ":"))

    omitted = 0
    while len(_line(kept, omitted)) > budget and kept:
        kept.popitem()  # dict is slowest-first; popitem drops the fastest
        omitted += 1
    print(_line(kept, omitted))


if __name__ == "__main__":
    main()
