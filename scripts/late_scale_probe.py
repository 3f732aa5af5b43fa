"""Scale probe for the END-of-r9 operators (VERDICT r9 #6): the ops
that landed after the last probe run (embedding_drift_report,
classifier_pr_curve, quality_ensemble_deciles, web_pipeline_funnel)
get measured 10x growth exponents like their siblings in SCALE.md.
Nothing is written to /root/testdata; derived corpora live in-memory.

Expectations under test:
  - embedding_drift_report: a pure per-row projection (cosine of a
    vector against its in-plan planted re-embedding) - wall must be
    ~flat-to-linear in rows with zero shuffle.
  - classifier_pr_curve: hashing-trick featurize + frozen-weight
    score + 9-literal threshold explode into one map-side-combined
    9-group aggregate - linear scan cost, constant shuffle (9 groups).
  - quality_ensemble_deciles: one signal projection + doc-keyed
    entropy join + 1-row broadcast cutoffs + per-row decile
    arithmetic - linear, never a global rank window.
  - web_pipeline_funnel stages: blocklist/quality predicates scan-
    side; the pair stage's candidate mass tracks posting-list sizes.
    Replicas carry per-replica token prefixes (disjoint shingles), so
    near-dup density stays the baseline's and pair mass must grow
    ~linearly with the corpus.

roll_yield_report is NOT probed: its input is the settlement config
(a contract-month dimension, 6 rows at every sf; size is set by the
calendar, not the corpus) - there is no corpus axis to scale.

Usage: python scripts/late_scale_probe.py [replicas]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.graph import (
    connected_components,
)
from txf_continuous_data_pipeline_spark.operators.similarity import cosine
from txf_continuous_data_pipeline_spark.operators.textstats import (
    entropy_stats,
    hashing_trick_embed,
    logreg_score,
    quality_score,
    token_count,
)
from txf_continuous_data_pipeline_spark.queries.text import (
    _build_shingle_index,
    _logreg_weights,
    _pairs_from_index,
    _PAIRS_FLOOR,
    _PR_THRESHOLDS,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.1"


def _rep_frame(df, id_col, r, reps):
    """Replicate df `reps`-fold with collision-free remapped ids
    (id*reps + replica) - shared by the knn and salt probes."""
    return (
        df.crossJoin(r)
        .select(
            (F.col(id_col) * reps + F.col("rep")).alias(id_col),
            *[c for c in df.columns if c != id_col],
        )
        .localCheckpoint(eager=True)
    )


def _t(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def drift_report(emb):
    """embedding_drift_report's projection (queries/similarity.py)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    delta = F.zip_with(
        v,
        F.sequence(F.lit(0), F.size(v) - 1),
        lambda x, i: x
        + F.lit(0.05)
        * F.when((F.col("vec_id") + i) % 2 == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        ),
    )
    w = F.when(F.col("vec_id") % 9 == 0, delta).otherwise(v)
    cos = F.round(cosine(v, w), 6)
    return emb.select(
        "vec_id",
        cos.alias("cos_v1_v2"),
        (cos < 1.0).cast("int").alias("drifted"),
    )


def pr_curve(docs):
    """classifier_pr_curve's plan (queries/text.py)."""
    scored = logreg_score(
        hashing_trick_embed(docs, dim=64), _logreg_weights(64), -0.1
    ).join(docs.select("doc_id", "lang"), "doc_id")
    s = scored.select(
        "score", (F.col("lang") == "en").cast("int").alias("y")
    )
    th = F.explode(
        F.array(*[F.lit(t) for t in _PR_THRESHOLDS])
    ).alias("threshold")
    return (
        s.select("score", "y", th)
        .groupBy("threshold")
        .agg(
            F.count_if(
                (F.col("score") >= F.col("threshold")) & (F.col("y") == 1)
            ).alias("tp"),
            F.count_if(
                (F.col("score") >= F.col("threshold")) & (F.col("y") == 0)
            ).alias("fp"),
        )
    )


def ensemble_deciles(docs):
    """quality_ensemble_deciles' plan (queries/text.py)."""
    base = docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("s1"),
        token_count(F.col("text")).cast("double").alias("s3"),
    )
    ent = entropy_stats(docs).select(
        "doc_id", F.col("token_entropy").alias("s2")
    )
    s = base.join(ent, "doc_id").localCheckpoint(eager=True)
    pcts = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    cuts = s.agg(
        *[
            F.transform(
                F.percentile(F.col(c), pcts), lambda x: F.round(x, 6)
            ).alias(f"c{i}")
            for i, c in ((1, "s1"), (2, "s2"), (3, "s3"))
        ]
    )
    j = s.crossJoin(F.broadcast(cuts))

    def dec(sig, cut):
        return F.size(F.filter(F.col(cut), lambda c: F.col(sig) > c))

    return j.select(
        "doc_id",
        dec("s1", "c1").alias("d1"),
        dec("s2", "c2").alias("d2"),
        dec("s3", "c3").alias("d3"),
    )


def funnel(docs):
    """web_pipeline_funnel's stage chain (queries/text.py), pair
    frame built fresh for the probe corpus (the registry query reads
    it from the per-corpus cache)."""
    d1 = docs.where(~F.col("source").isin("src2", "src3"))
    sc = d1.select(
        "doc_id",
        "source",
        "text",
        F.round(quality_score(F.col("text")), 6).alias("score"),
    )
    cut = sc.groupBy("source").agg(
        F.round(F.percentile(F.col("score"), F.lit(0.25)), 6).alias(
            "cutoff"
        )
    )
    d2 = (
        sc.join(F.broadcast(cut), "source")
        .where(F.col("score") >= F.col("cutoff"))
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=True)
    )
    pairs = _pairs_from_index(
        _build_shingle_index(d2), _PAIRS_FLOOR
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.where(F.col("id") != F.col("component")).count()
    return {
        "n_in": docs.count(),
        "n_blocklist": d1.count(),
        "n_quality": d2.count(),
        "n_pairs": n_pairs,
        "n_kept": d2.count() - losers,
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("late_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replicas": reps}

    emb = read_table(spark, SF_DIR, "embeddings").localCheckpoint(
        eager=True
    )
    r = spark.range(reps).select(F.col("id").alias("rep"))
    emb_big = (
        emb.crossJoin(r)
        .select(
            (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )
    w, n = _t(lambda: drift_report(emb).count())
    out["drift_1x"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: drift_report(emb_big).count())
    out[f"drift_{reps}x"] = {"wall_s": w, "rows": n}

    docs = read_table(spark, SF_DIR, "documents").localCheckpoint(
        eager=True
    )
    # clean replication: per-replica token prefix keeps shingle sets
    # disjoint across replicas (near-dup density stays the baseline's)
    rep_s = F.col("rep").cast("string")
    docs_big = (
        docs.crossJoin(r)
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            "source",
            "lang",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(rep_s, F.lit("_"), t),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    w, n = _t(lambda: pr_curve(docs).count())
    out["pr_curve_1x"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: pr_curve(docs_big).count())
    out[f"pr_curve_{reps}x"] = {"wall_s": w, "rows": n}

    w, n = _t(lambda: ensemble_deciles(docs).count())
    out["deciles_1x"] = {"wall_s": w, "rows": n}
    w, n = _t(lambda: ensemble_deciles(docs_big).count())
    out[f"deciles_{reps}x"] = {"wall_s": w, "rows": n}

    w, d = _t(lambda: funnel(docs))
    out["funnel_1x"] = {"wall_s": w, **d}
    w, d = _t(lambda: funnel(docs_big))
    out[f"funnel_{reps}x"] = {"wall_s": w, **d}

    print(json.dumps(out, indent=2))




def ivf_knn_probe() -> None:
    """Separate entry: ivf_knn_join growth exponents (r10's
    knn_label_propagation engine). Three axes: corpus 10x at fixed
    queries (candidate mass ~ corpus share per probed cell -> linear),
    queries 10x at fixed corpus (linear), both 10x at the FIXED 4-cell
    layout (quadratic BY DESIGN - the fixed-cell degenerate case whose
    production answer is training ~sqrt(n) cells, exactly the
    ivfpq_index_cell_stats retrain trigger).

    Usage: python scripts/late_scale_probe.py knn [replicas]
    """
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        ivf_knn_join,
    )
    from txf_continuous_data_pipeline_spark.queries.similarity import (
        _fixed_centroids,
    )

    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ivf_knn_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, SF_DIR, "embeddings").localCheckpoint(
        eager=True
    )
    r = spark.range(reps).select(F.col("id").alias("rep"))

    q1 = emb.where(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).localCheckpoint(eager=True)
    c1 = emb.where(F.col("vec_id") % 5 != 0).localCheckpoint(eager=True)
    qN = _rep_frame(q1, "q_id", r, reps)
    cN = _rep_frame(c1, "vec_id", r, reps)
    cents = _fixed_centroids()
    out: dict = {"replicas": reps}
    for tag, qq, cc in (
        ("1x_1x", q1, c1),
        (f"q1x_c{reps}x", q1, cN),
        (f"q{reps}x_c1x", qN, c1),
        (f"q{reps}x_c{reps}x", qN, cN),
    ):
        t0 = time.perf_counter()
        n = ivf_knn_join(qq, cc, cents, k=5, nprobe=2).count()
        out[tag] = {
            "wall_s": round(time.perf_counter() - t0, 2), "rows": n
        }
    print(json.dumps(out, indent=2))




def salt_probe() -> None:
    """Hot-cell salting A/B: force every corpus vector into ONE
    effective cell (a single centroid at the data mean wins every
    assignment) so the cluster_id equi-join has exactly one key, then
    time n_salt=1 vs n_salt=8. The candidate SET is identical (the
    salted join is row-identity-pinned); what changes is the shuffle
    key fan-out - one hot key serializes the scoring into one task,
    salting spreads it across 8.

    Usage: python scripts/late_scale_probe.py salt [replicas]
    """
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        ivf_knn_join,
    )

    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("salt_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, SF_DIR, "embeddings").localCheckpoint(
        eager=True
    )
    r = spark.range(reps).select(F.col("id").alias("rep"))
    big = _rep_frame(emb.select("vec_id", "embedding"), "vec_id", r, reps)
    q = big.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).localCheckpoint(eager=True)
    c = big.where(F.col("vec_id") % 20 != 0).localCheckpoint(eager=True)
    # one centroid at the mean = every vector lands in cell 0 (plus 3
    # unreachable far-away cells so nprobe=1 of 4 keeps the plan shape)
    import numpy as np

    mean = (
        emb.select(F.posexplode("embedding").alias("p", "x"))
        .groupBy("p").agg(F.avg("x").alias("m")).orderBy("p").collect()
    )
    mvec = [float(r["m"]) for r in mean]
    far = [[1e6 + i] * len(mvec) for i in range(3)]
    cents = [(0, mvec)] + [(i + 1, v) for i, v in enumerate(far)]
    out: dict = {"replicas": reps, "n_q": q.count(), "n_c": c.count()}
    # untimed warmup: the first pandas-UDF stage pays Python worker
    # spin-up + Arrow init, which otherwise lands on whichever arm
    # runs first and biases the A/B (r10 review wave 3)
    ivf_knn_join(
        q.limit(10), c, cents, k=5, nprobe=1
    ).write.format("noop").mode("overwrite").save()
    for tag, salt in (("hot_unsalted", 1), ("hot_salt8", 8)):
        t0 = time.perf_counter()
        n = ivf_knn_join(q, c, cents, k=5, nprobe=1, n_salt=salt).count()
        out[tag] = {
            "wall_s": round(time.perf_counter() - t0, 2), "rows": n
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "knn":
        ivf_knn_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "salt":
        salt_probe()
    else:
        main()
