"""Scale probe for duplicated-span removal (the Lee et al. remediation).

No sf1 testdata exists, so the 10x corpus is DERIVED in-memory from
sf0.1 documents (same discipline as scale_probe.py; nothing is written
to /root/testdata), two ways:

* "clean"    every token prefixed with the replica id: span sets are
             disjoint across replicas, so the corpus grows 10x at the
             baseline's duplication density. Claim: hot spans and
             removal mass grow ~linearly (~10x), wall time ~linearly -
             the hash-keyed aggregate + semi-join never enumerates
             doc pairs.
* "dupheavy" replicas carry the IDENTICAL text under fresh ids: every
             span becomes hot and every token removable - the
             worst-case removal mass (a crawl of mirrored pages).
             Claim: the probe still completes in ~linear wall time
             because per-doc excision work is bounded by that doc's
             tokens x its own duplicated starts, never by the corpus.

For each corpus: docs, distinct spans, hot spans (df >= 2), docs
touched, tokens kept/removed, stage wall seconds.

Usage: python scripts/span_scale_probe.py [replicas]   (default 10)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.dedup import (
    remove_duplicated_spans,
    shingles_exploded,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.1"
ID_OFFSET = 1_000_000


def replicate(docs, replicas: int, *, mode: str):
    if replicas <= 1:
        return docs.select("doc_id", "text")
    r = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    out = docs.select("doc_id", "text", r)
    if mode == "dupheavy":
        text = F.col("text")
    else:  # clean: replica-prefixed tokens -> disjoint span sets
        text = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda t: F.concat(
                    F.lit("r"), F.col("rep").cast("string"), F.lit("_"), t
                ),
            ),
        )
    return out.select(
        (F.col("doc_id") + F.col("rep") * ID_OFFSET).alias("doc_id"),
        text.alias("text"),
    )


def probe(docs, label: str) -> dict:
    docs = docs.localCheckpoint(eager=True)
    t0 = time.perf_counter()
    ex = shingles_exploded(docs, n=5, hashed=True)
    span_stats = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.count(F.lit(1)).alias("spans"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("hot"),
        )
        .collect()[0]
    )
    t1 = time.perf_counter()
    cleaned = remove_duplicated_spans(docs, n=5, min_df=2)
    agg = cleaned.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("n_tokens_removed") > 0, 1).otherwise(0)).alias(
            "touched"
        ),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_tokens_removed").alias("removed"),
    ).collect()[0]
    t2 = time.perf_counter()
    out = {
        "corpus": label,
        "docs": int(agg["docs"]),
        "spans": int(span_stats["spans"]),
        "hot_spans": int(span_stats["hot"]),
        "docs_touched": int(agg["touched"]),
        "tokens": int(agg["tokens"]),
        "tokens_removed": int(agg["removed"]),
        "index_sec": round(t1 - t0, 2),
        "removal_sec": round(t2 - t1, 2),
    }
    print(json.dumps(out))
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("span_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base = probe(docs, "sf0.1")
    clean = probe(
        replicate(docs, replicas, mode="clean"), f"x{replicas} clean"
    )
    dup = probe(
        replicate(docs, replicas, mode="dupheavy"), f"x{replicas} dupheavy"
    )
    ratio = clean["removal_sec"] / max(base["removal_sec"], 1e-9)
    print(
        json.dumps(
            {
                "clean_removal_time_ratio": round(ratio, 2),
                "clean_hot_ratio": round(
                    clean["hot_spans"] / max(base["hot_spans"], 1), 2
                ),
                "dupheavy_removed_frac": round(
                    dup["tokens_removed"] / max(dup["tokens"], 1), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
