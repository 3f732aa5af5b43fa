"""Scale probe for the LSH-bucketed embedding near-dup block (r5).

Validates SCALE.md's banding math on a DERIVED 10x corpus (nothing
written to /root/testdata): at FIXED band width w the random-pair
candidate count grows ~n^2 * bands / 2^w, and widening w with n (the
stated scaling dial, w ~ log2 n) restores near-linear candidate
growth while planted near-identical pairs stay fully recalled.

Corpora derived from sf0.1 embeddings (2000 vectors):
  clean   replicas fully re-randomized per (vec_id, rep) - corpus
          grows Rx with no planted structure (background collisions
          only).
  neardup replicas = original + N(0, 1e-3) noise - every vector gains
          R-1 true near-dups (cos ~ 0.9999), the heavy tail the block
          must surface.

Usage: python scripts/embedding_scale_probe.py [replicas]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from txf_continuous_data_pipeline_spark.operators.similarity import (
    band_bucket_expr,
    hyperplane_signatures,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.1"
ID_OFFSET = 1_000_000


def _replica_vec_udf():
    # created lazily: pandas_udf parses its DDL type against the active
    # SparkSession, which does not exist at import time
    @pandas_udf("array<double>")
    def _replica_vec(
        vid: pd.Series, rep: pd.Series, vec: pd.Series, mode: pd.Series
    ) -> pd.Series:
        out = []
        for i, r, v, m in zip(vid, rep, vec, mode):
            rng = np.random.RandomState(
                (int(i) * 1000003 + int(r) * 7919) % (2**31)
            )
            base = np.asarray(v, dtype=np.float64)
            if int(r) == 0:
                out.append(base)
            elif m == "neardup":
                out.append(base + rng.normal(scale=1e-3, size=base.shape))
            else:
                out.append(rng.normal(size=base.shape))
        return pd.Series(out)

    return _replica_vec


def corpus(emb, replicas: int, mode: str):
    if replicas <= 1:
        return emb.select("vec_id", "embedding")
    r = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    mk = _replica_vec_udf()
    return (
        emb.select("vec_id", "embedding", r)
        .select(
            (F.col("vec_id") + F.col("rep") * ID_OFFSET).alias("vec_id"),
            mk(
                F.col("vec_id"), F.col("rep"), F.col("embedding"), F.lit(mode)
            ).alias("embedding"),
        )
    )


def candidates(emb, n_planes: int, bands: int):
    sigs = hyperplane_signatures(emb, n_planes=n_planes).localCheckpoint(
        eager=False
    )
    # production banding derivation, not a probe-local copy
    banded = sigs.select(
        "vec_id", band_bucket_expr(n_planes, bands).alias("band", "bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("emb_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    rows = []
    for mode, reps in (("clean", 1), ("clean", replicas), ("neardup", replicas)):
        c = corpus(emb, reps, mode).localCheckpoint(eager=True)
        n = c.count()
        wide_cand = None
        for n_planes, bands in ((56, 7), (48, 4)):
            w = n_planes // bands
            t0 = time.perf_counter()
            cand = candidates(c, n_planes, bands).localCheckpoint(
                eager=False
            )
            n_cand = cand.count()
            if (n_planes, bands) == (48, 4):
                wide_cand = cand
            dt = round(time.perf_counter() - t0, 1)
            frac = round(n_cand / (n * (n - 1) / 2), 4)
            rows.append(
                dict(
                    mode=mode, reps=reps, n=n, w=w, bands=bands,
                    candidates=n_cand, frac_of_pairs=frac, sec=dt,
                )
            )
            print(json.dumps(rows[-1]))
        if mode == "neardup":
            # recall of planted near-identical pairs at the WIDE config
            # (w=12): every (orig, replica) pair must collide. Reuses
            # the checkpointed candidate frame counted above.
            planted = wide_cand.where(
                (F.col("id_a") % ID_OFFSET) == (F.col("id_b") % ID_OFFSET)
            ).count()
            want = n0 * (reps * (reps - 1) // 2)
            print(
                json.dumps(
                    {"planted_pairs_found": planted, "planted_pairs": want}
                )
            )
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
