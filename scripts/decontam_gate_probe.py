"""10x staged run of the STREAMING decontamination gate with
disjoint-vocab drift between batches (r13 verdict #5).

The r13 cross-dictionary bug lived in the standalone per-batch
suffix_eval_overlap path that only the streaming gate exercises; the
registry query (shared-frame arm) could never catch it. This probe
stages the drift shape that triggered it at 10x the bench corpus:

- train side: 10 replica batches of the sf0.1 non-src0 documents, one
  feed file per micro-batch, every token prefixed "r<i>_" -- so EVERY
  batch arrives with a vocabulary disjoint from every other batch and
  from whatever the previous batch's dictionary contained;
- eval side: the union of the 10 replica-prefixed src0 doc sets
  (frozen, as the gate contract requires), so each batch's
  contamination must be found across a vocabulary the eval side shares
  only with that replica.

Checks (printed as JSON lines, recorded in SCALE.md):
- stream == batch fold: the union of per-batch gate verdicts equals
  suffix_eval_overlap(all train, eval) >= max_run flags, doc-exact;
- conservation: kept + quarantined == fed, disjoint;
- wall seconds for the whole 10-batch run.

Usage: python scripts/decontam_gate_probe.py [replicas] [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
ID_OFFSET = 1_000_000


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    from txf_continuous_data_pipeline_spark.operators.dedup import (
        suffix_eval_overlap,
    )
    from txf_continuous_data_pipeline_spark.session import get_spark
    from txf_continuous_data_pipeline_spark.sources import read_table
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        decontam_gate_ingest_run,
    )

    spark = get_spark(
        "decontam_gate_probe",
        extra_conf={"spark.sql.shuffle.partitions": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(workdir, f"decontam_gate_{replicas}x")
    if os.path.exists(root):
        shutil.rmtree(root)
    feed = os.path.join(root, "feed")
    work = os.path.join(root, "work")
    os.makedirs(feed)

    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )

    def _prefixed(df, rep: int):
        text = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.concat(F.lit(f"r{rep}_"), t),
            ),
        )
        return df.select(
            (F.col("doc_id") + F.lit(rep * ID_OFFSET)).alias("doc_id"),
            "source",
            text.alias("text"),
        )

    train = docs.where(F.col("source") != "src0")
    ev = None
    t_stage = time.monotonic()
    for rep in range(replicas):
        _prefixed(train, rep).coalesce(1).write.mode("append").parquet(
            feed
        )
        ev_rep = _prefixed(docs.where(F.col("source") == "src0"), rep)
        ev = ev_rep if ev is None else ev.unionByName(ev_rep)
    ev = ev.localCheckpoint(eager=True)
    print(
        json.dumps(
            {
                "staged_s": round(time.monotonic() - t_stage, 1),
                "eval_rows": ev.count(),
                "feed_files": len(
                    [f for f in os.listdir(feed) if f.endswith(".parquet")]
                ),
            }
        ),
        flush=True,
    )

    t0 = time.monotonic()
    kept_dir, quar_dir = decontam_gate_ingest_run(
        spark, feed, work, ev, max_run=8, timeout_s=3600
    )
    wall = time.monotonic() - t0

    kept = spark.read.parquet(kept_dir).select("doc_id")
    quar = spark.read.parquet(quar_dir).select("doc_id")
    n_kept, n_quar = kept.count(), quar.count()

    # batch fold over the WHOLE train side at once
    t1 = time.monotonic()
    all_train = spark.read.parquet(feed)
    lens = suffix_eval_overlap(all_train, ev)
    flagged = (
        lens.groupBy("doc_id")
        .agg(F.max("eval_len").alias("mx"))
        .where(F.col("mx") >= 8)
        .select("doc_id")
    )
    batch_wall = time.monotonic() - t1

    n_fed = all_train.count()
    sym_diff = (
        quar.unionByName(flagged)
        .groupBy("doc_id")
        .count()
        .where(F.col("count") != 2)
        .count()
    )
    overlap_kq = kept.join(quar, "doc_id", "inner").count()
    print(
        json.dumps(
            {
                "replicas": replicas,
                "fed": n_fed,
                "kept": n_kept,
                "quarantined": n_quar,
                "stream_wall_s": round(wall, 1),
                "batch_fold_wall_s": round(batch_wall, 1),
                "stream_eq_batch": sym_diff == 0,
                "conserved": n_kept + n_quar == n_fed,
                "kept_quar_disjoint": overlap_kq == 0,
            }
        ),
        flush=True,
    )
    if sym_diff or overlap_kq or n_kept + n_quar != n_fed:
        sys.exit(1)


if __name__ == "__main__":
    main()
