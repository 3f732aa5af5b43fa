"""Scale probe for the late-r9 curation operators (nothing written to
/root/testdata): semantic_contamination's scan-only claim, the
source-overlap matrix's vocabulary-bounded join, and kNN label
propagation's query-side linearity.

Expectations being validated against SCALE.md:
  - semantic_contamination: wall tracks the CORPUS linearly at fixed
    eval size (one Arrow matmul pass, no pairs); growing the EVAL side
    10x multiplies only the per-batch matmul width.
  - source_overlap_matrix: the join input is the distinct
    (source, shingle-hash) set - replicating docs 10x with the SAME
    text grows the corpus 10x but the vocab ~1x, so wall must grow
    far sublinearly (the explode dominates, the join does not).
  - knn_label_propagation: wall ~ n_query x n_corpus; a 4x query set
    at fixed corpus costs ~4x the scoring mass.

Usage: python scripts/curation_scale_probe.py [replicas]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.similarity import (
    semantic_contamination,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.1"


def _t(fn):
    t0 = time.perf_counter()
    n = fn().count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("curation_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    emb = read_table(spark, SF_DIR, "embeddings").localCheckpoint(
        eager=True
    )
    r = spark.range(reps).select(F.col("id").alias("rep"))
    big = (
        emb.crossJoin(r)
        .select(
            (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
            "embedding",
            "label",
        )
        .localCheckpoint(eager=True)
    )
    ev = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("eval_vec"),
    )
    ev_big = big.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("eval_vec"),
    )

    out: dict = {"replicas": reps}
    w, n = _t(lambda: semantic_contamination(emb, ev))
    out["semdecon_1x"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: semantic_contamination(big, ev))
    out[f"semdecon_{reps}x_corpus"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: semantic_contamination(emb, ev_big))
    out[f"semdecon_{reps}x_eval"] = {"wall_s": w, "rows": n}

    docs = read_table(spark, SF_DIR, "documents").localCheckpoint(
        eager=True
    )
    docs_big = (
        docs.crossJoin(r)
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            "text",
            "source",
        )
        .localCheckpoint(eager=True)
    )

    # the SHIPPED join shape, shared with source_overlap_matrix_q -
    # if the query's build changes, the probe measures the new shape
    from txf_continuous_data_pipeline_spark.queries.text import (
        source_shared_shingles as _overlap,
    )

    w, n = _t(lambda: _overlap(docs))
    out["overlap_1x"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: _overlap(docs_big))
    out[f"overlap_{reps}x_samevocab"] = {"wall_s": w, "rows": n}

    from txf_continuous_data_pipeline_spark.operators.similarity import (
        knn_join_bruteforce,
    )

    labeled = emb.where(F.col("vec_id") % 5 != 0)

    def _knn(mod):
        q = emb.where(F.col("vec_id") % mod == 0).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
        )
        return knn_join_bruteforce(q, labeled, k=5)

    w, n = _t(lambda: _knn(20))  # 100 queries
    out["knn_q100"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: _knn(5))  # 400 queries
    out["knn_q400"] = {"wall_s": w, "rows": n}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
