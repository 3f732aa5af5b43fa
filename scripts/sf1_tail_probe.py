"""sf1-equivalent staged run of the registry's five tail queries
(r12 verdict item 6): exact_decontamination, exact_substr_stats,
web_pipeline_funnel, dup_span_removal_delta, bm25_index_topk.

No sf1 testdata exists, so an sf1-equivalent documents table is DERIVED
from sf0.1 (the suffix/span probe discipline; nothing written to
/root/testdata): 10 replicas with replica-prefixed tokens ("clean"
mode - suffix/span/term content is disjoint across replicas, so the
corpus grows 10x at baseline duplication density), doc ids offset by
an EVEN constant per replica (preserves the odd/even delta split and
keeps the bm25 query docs unique to replica 0), source/lang preserved
(so the src0 eval side scales with the corpus, the honest
decontamination shape). The staged dir holds the derived
documents.parquet plus symlinks to every other sf0.1 table, so the
queries run through the UNMODIFIED driver contract.

Per query: wall seconds, total shuffle read/write bytes and input
bytes (REST status API, per-stage delta), and any single-task stage
moving >32 MB - the "no new single-task stage" check.

Usage: python scripts/sf1_tail_probe.py [replicas] [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
ID_OFFSET = 1_000_000  # even: preserves doc_id parity per replica
QUERIES = [
    "exact_substr_stats",
    "exact_decontamination",
    "web_pipeline_funnel",
    "dup_span_removal_delta",
    "bm25_index_topk",
    # r14 standing-tier additions (verdict #4): the current bench tail's
    # documents-derived heavies after the r14 rewrites
    "video_phash_neardup",
    "neardup_groups",
    "minhash_neardup",
]


def stage_documents(spark, replicas: int, workdir: str) -> str:
    staged = os.path.join(workdir, f"sf1_stage_{replicas}x")
    docs_path = os.path.join(staged, "documents.parquet")
    if os.path.exists(staged):
        shutil.rmtree(staged)
    os.makedirs(staged)
    for t in TABLES:
        if t == "documents":
            continue
        os.symlink(
            os.path.join(SF_DIR, f"{t}.parquet"),
            os.path.join(staged, f"{t}.parquet"),
        )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rep = F.explode(
        F.sequence(F.lit(0), F.lit(replicas - 1))
    ).alias("rep")
    text = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda t: F.concat(
                F.lit("r"), F.col("rep").cast("string"), F.lit("_"), t
            ),
        ),
    )
    tmp_dir = os.path.join(staged, "_docs_build")
    (
        docs.select("doc_id", "text", "lang", "source", rep)
        .select(
            (F.col("doc_id") + F.col("rep") * ID_OFFSET).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        )
        .repartition(1)  # read_table expects ONE parquet file per table
        .write.mode("overwrite")
        .parquet(tmp_dir)
    )
    part = [
        f
        for f in os.listdir(tmp_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    ][0]
    os.rename(os.path.join(tmp_dir, part), docs_path)
    shutil.rmtree(tmp_dir)
    return staged


def _stages(ui: str) -> dict:
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    data = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    return {
        (s["stageId"], s["attemptId"]): s for s in data
    }


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        # the 10x suffix slice mass needs real executor memory; a bare
        # local session defaults to 1g and OOMs the range sort
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("sf1_tail_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    staged = stage_documents(spark, replicas, workdir)
    n = spark.read.parquet(
        os.path.join(staged, "documents.parquet")
    ).count()
    print(json.dumps({"staged": staged, "docs": n}), flush=True)

    qs = mod.queries()
    for name in QUERIES:
        before = _stages(ui)
        t0 = time.perf_counter()
        rows = qs[name](spark, staged).count()
        wall = time.perf_counter() - t0
        after = _stages(ui)
        new = [s for k, s in after.items() if k not in before]
        sr = sum(s.get("shuffleReadBytes", 0) for s in new)
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        inp = sum(s.get("inputBytes", 0) for s in new)
        single = [
            {
                "stage": s["stageId"],
                "mb": round(
                    max(
                        s.get("shuffleReadBytes", 0),
                        s.get("inputBytes", 0),
                    )
                    / 1e6,
                    1,
                ),
            }
            for s in new
            if s.get("numTasks", 0) == 1
            and max(
                s.get("shuffleReadBytes", 0), s.get("inputBytes", 0)
            )
            > 32e6
        ]
        print(
            json.dumps(
                {
                    "query": name,
                    "rows": rows,
                    "wall_sec": round(wall, 1),
                    "stages": len(new),
                    "shuffle_read_mb": round(sr / 1e6, 1),
                    "shuffle_write_mb": round(sw / 1e6, 1),
                    "input_mb": round(inp / 1e6, 1),
                    "single_task_stages_gt32mb": single,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
