"""Scale probe for corpus-wide line-level dedup (the CCNet-style
first-pass clean).

No sf1 testdata exists, so the 10x corpus is DERIVED in-memory from
sf0.1 documents (the span_scale_probe discipline; nothing is written to
/root/testdata), two ways:

* "clean"    every line prefixed with the replica id: line sets are
             disjoint across replicas, so the corpus grows 10x at the
             baseline's duplication density. Claim: distinct lines,
             dup mass and wall time all grow ~linearly - the
             first-occurrence aggregate + hash join never enumerates
             line pairs, and map-side combine bounds the shuffle.
* "dupheavy" replicas carry IDENTICAL text under fresh ids: every
             line in replicas 1..9 is a duplicate of replica 0's -
             the mirrored-crawl worst case where ~90% of all lines
             are removed. Claim: still ~linear wall time; the hot
             line hashes collapse to one row per map task before the
             exchange, so corpus-wide boilerplate cannot skew a
             reducer.

For each corpus: docs, lines, distinct participating lines, lines
removed, stage wall seconds.

Usage: python scripts/line_scale_probe.py [replicas]   (default 10)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.dedup import dedup_lines
from txf_continuous_data_pipeline_spark.queries.text import _line_layout_col
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.1"
ID_OFFSET = 1_000_000


def replicate(docs, replicas: int, *, mode: str):
    if replicas <= 1:
        return docs.select("doc_id", "text")
    r = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    rep = docs.select("doc_id", "text", r)
    if mode == "clean":
        # replica-prefixed lines keep per-replica line sets disjoint
        text = F.array_join(
            F.transform(
                F.split(F.col("text"), "\n"),
                lambda ln: F.concat_ws("_", F.col("rep"), ln),
            ),
            "\n",
        )
    else:
        text = F.col("text")
    return rep.select(
        (F.col("doc_id") + F.col("rep") * ID_OFFSET).alias("doc_id"),
        text.alias("text"),
    )


def probe(docs, label: str):
    docs = docs.localCheckpoint(eager=True)
    t0 = time.time()
    out = dedup_lines(docs)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_lines_removed").alias("removed"),
    ).collect()[0]
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "corpus": label,
                "docs": int(agg["docs"]),
                "lines": int(agg["lines"]),
                "lines_removed": int(agg["removed"]),
                "removal_s": round(wall, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("line_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SF_DIR, "documents").select(
        "doc_id", _line_layout_col().alias("text")
    )
    probe(replicate(base, 1, mode="clean"), f"sf0.1")
    probe(
        replicate(base, replicas, mode="clean"),
        f"x{replicas} clean",
    )
    probe(
        replicate(base, replicas, mode="dupheavy"),
        f"x{replicas} dupheavy",
    )


if __name__ == "__main__":
    main()
