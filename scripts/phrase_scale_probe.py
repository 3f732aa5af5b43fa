"""Scale probe for exact phrase search over positional postings.

No sf1 testdata exists, so the 10x corpus is DERIVED in-memory from
sf0.1 documents (the line_scale_probe discipline; nothing is written
to /root/testdata), two ways:

* "clean"    replicas carry the replica id prefixed to every token:
             posting lists grow 10x but each phrase only matches its
             own replica - the baseline duplication density. Claim:
             postings, hits and wall time grow ~linearly; the
             broadcast phrase prune touches only matching term
             hashes, and the anchor aggregate is doc-keyed.
* "stopword" replicas are identical text under fresh ids AND every
             phrase begins with the corpus's most frequent token -
             the hot-posting-list worst case. Claim: still ~linear;
             the posting join stays equi on the hash, and map-side
             combine bounds the anchor shuffle - the skewed list
             inflates one join input, never a pair product.

For each corpus: docs, posting rows entering the join, (query, doc)
hits, stage wall seconds.

Usage: python scripts/phrase_scale_probe.py [replicas]  (default 10)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.dedup import (
    normalized_tokens,
)
from txf_continuous_data_pipeline_spark.operators.textstats import (
    phrase_search,
)
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
        # disjoint token space per replica: prefix every token
        text = F.array_join(
            F.transform(
                normalized_tokens(F.col("text")),
                lambda t: F.concat(
                    F.lit("r"), F.col("rep").cast("string"), F.lit("_"), t
                ),
            ),
            " ",
        )
    else:  # identical text, duplicated mass
        text = F.col("text")
    return rep.select(
        (F.col("doc_id") + F.col("rep") * ID_OFFSET).alias("doc_id"),
        text.alias("text"),
    )


def probe(spark, docs, queries, label):
    t0 = time.time()
    hits = phrase_search(docs, queries).count()
    wall = round(time.time() - t0, 2)
    n_docs = docs.count()
    print(
        json.dumps(
            {"corpus": label, "docs": n_docs, "hits": hits, "sec": wall}
        )
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("phrase_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )

    # most frequent token = the hottest posting list
    hot = (
        base.select(
            F.explode(normalized_tokens(F.col("text"))).alias("t")
        )
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), "t")
        .first()["t"]
    )

    def queries_for(docs, *, hot_prefix: bool):
        q = docs.where(F.col("doc_id") % 997 == 0).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(normalized_tokens(F.col("text")), 1, 3), " "
            ).alias("q_text"),
        )
        if hot_prefix:
            q = q.select(
                "q_id",
                F.concat(F.lit(hot + " "), F.col("q_text")).alias(
                    "q_text"
                ),
            )
        return q.localCheckpoint(eager=True)

    b = base.localCheckpoint(eager=True)
    probe(spark, b, queries_for(b, hot_prefix=False), "sf0.1")
    for mode in ("clean", "stopword"):
        big = replicate(base, replicas, mode=mode).localCheckpoint(
            eager=True
        )
        probe(
            spark,
            big,
            queries_for(big, hot_prefix=(mode == "stopword")),
            f"x{replicas} {mode}",
        )
    spark.stop()


if __name__ == "__main__":
    main()
