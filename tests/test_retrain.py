"""IVFPQ coarse-quantizer retrain loop (operators/similarity.
retrain_ivfpq_index) - closes the loop the skew tripwire
(ivfpq_index_cell_stats) only pointed at through r10: planted drifted
ingest trips the monitor, retrain re-fits the coarse centroids on a
bounded sample and atomic-swaps the re-encoded index, restoring
imbalance under the tripwire threshold; the swapped index serves
byte-for-value identically to a from-scratch rebuild under the same
quantizers.

Everything is deterministic (md5-seeded Lloyd init, fixed synthetic
groups), so the post-retrain cell layout is stable run to run.
"""

from __future__ import annotations

import os

from txf_continuous_data_pipeline_spark.operators.similarity import (
    append_ivfpq_index,
    ivfpq_index_cell_stats,
    ivfpq_topk_from_index,
    publish_index,
    retrain_ivfpq_index,
    write_ivfpq_index,
)

DIM, M = 8, 4
CB = [(0, [0.0] * DIM), (1, [1.0] * DIM)]


def _pts(spark, vid0, centers, n_per=16):
    rows = []
    vid = vid0
    for cx in centers:
        for j in range(n_per):
            v = [cx + 0.001 * j, 0.1 * (j % 4)] + [0.0] * (DIM - 2)
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _frozen_cents():
    # coarse centroids at x = 0, 10, 20, 30
    return [(c, [10.0 * c] + [0.0] * (DIM - 1)) for c in range(4)]


def _stored(spark, p):
    return {
        (r["vec_id"], r["cluster_id"], tuple(r["codes"]))
        for r in spark.read.parquet(p)
        .select("vec_id", "cluster_id", "codes")
        .collect()
    }


def test_drift_trips_monitor_and_retrain_restores_balance(
    spark, tmp_path
):
    cents = _frozen_cents()
    base = _pts(spark, 0, [0.0, 10.0, 20.0, 30.0])
    path = str(tmp_path / "idx")
    write_ivfpq_index(base, cents, CB, path, m=M)
    st = ivfpq_index_cell_stats(spark, path)
    assert not st["retrain"] and st["skew"] == 1.0, st

    # drifted ingest: three new tight groups, ALL nearest the x=0
    # centroid under the frozen quantizer -> one hot cell
    drift = _pts(spark, 1000, [-30.0, -20.0, -10.0])
    assert append_ivfpq_index(
        spark, path, drift, cents, CB, m=M
    ) == 48
    st = ivfpq_index_cell_stats(spark, path)
    assert st["retrain"] and st["skew"] > 2.0, st
    assert st["cell_sizes"][0] == 64, st  # 16 base + 48 drifted

    new_cents, st2 = retrain_ivfpq_index(
        spark, path, CB, m=M, n_cells=4
    )
    assert len(new_cents) == 4
    # the re-fit quantizer sees the 7 tight groups on the line and
    # re-partitions them; imbalance drops under the tripwire
    assert st2["skew"] < 2.0 and not st2["retrain"], st2
    assert sum(st2["cell_sizes"].values()) == 112  # nothing lost

    # served top-k == a from-scratch rebuild under the SAME quantizers
    rebuilt = str(tmp_path / "rebuilt")
    write_ivfpq_index(
        base.unionByName(drift), new_cents, CB, rebuilt, m=M
    )
    assert _stored(spark, path) == _stored(spark, rebuilt)
    qraw = _pts(spark, 5000, [-25.0, 15.0], n_per=2)

    def serve(p):
        return {
            (r["q_id"], r["rn"]): (r["vec_id"], r["sq_dist"])
            for r in ivfpq_topk_from_index(
                spark, p, qraw, new_cents, CB, m=M, k=3, nprobe=2,
                shortlist=20,
            ).collect()
        }

    got, want = serve(path), serve(rebuilt)
    assert got == want and got


def test_retrain_is_idempotent(spark, tmp_path):
    cents = _frozen_cents()
    path = str(tmp_path / "idx")
    write_ivfpq_index(
        _pts(spark, 0, [0.0, 10.0, 20.0, 30.0]), cents, CB, path, m=M
    )
    append_ivfpq_index(
        spark, path, _pts(spark, 1000, [-30.0, -20.0, -10.0]),
        cents, CB, m=M,
    )
    c1, s1 = retrain_ivfpq_index(spark, path, CB, m=M, n_cells=4)
    first = _stored(spark, path)
    # deterministic init + same corpus -> the second retrain converges
    # to the same quantizer and the index content is unchanged
    c2, s2 = retrain_ivfpq_index(spark, path, CB, m=M, n_cells=4)
    assert [v for _, v in sorted(c1)] == [v for _, v in sorted(c2)]
    assert s1["cell_sizes"] == s2["cell_sizes"]
    assert _stored(spark, path) == first


def test_publish_index_replace_swaps_and_buildonce_noops(
    spark, tmp_path
):
    path = str(tmp_path / "pub")

    def build_v(tag):
        def build(staging):
            spark.createDataFrame(
                [(tag,)], "v long"
            ).coalesce(1).write.parquet(staging)

        return build

    publish_index(spark, path, build_v(1))
    assert [r["v"] for r in spark.read.parquet(path).collect()] == [1]
    # build-once: a published index is never rewritten
    publish_index(spark, path, build_v(2))
    assert [r["v"] for r in spark.read.parquet(path).collect()] == [1]
    # replace: atomic swap to the new content, old dir gone
    publish_index(spark, path, build_v(3), replace=True)
    assert [r["v"] for r in spark.read.parquet(path).collect()] == [3]
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    leftovers = [
        d for d in os.listdir(tmp_path)
        if d.startswith("pub_") and ("retired" in d or "stage" in d)
    ]
    assert leftovers == [], leftovers
