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


def test_ingest_loop_auto_retrains_and_persists_quantizer(
    spark, tmp_path
):
    """auto_retrain=True closes the tripwire loop END TO END inside
    the ingest run: drifted feed batches trip the monitor, the
    post-drain retrain rebalances the index, the new quantizer
    persists to work_dir/quantizer, served top-k under the persisted
    quantizer equals a from-scratch rebuild, and a full replay over
    the consumed checkpoint changes nothing (live-stats recheck: an
    already-balanced index never re-triggers)."""
    import glob

    from txf_continuous_data_pipeline_spark.operators.similarity import (
        read_quantizer,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        ivfpq_index_ingest_run,
    )

    feed = str(tmp_path / "feed")
    os.makedirs(feed)

    def _stage(i, frame):
        stage = str(tmp_path / f"stage{i}")
        frame.withColumn(
            "label", frame["vec_id"].cast("int") * 0
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*"))[0]
        os.rename(part, os.path.join(feed, f"b{i}.parquet"))

    _stage(0, _pts(spark, 0, [0.0, 10.0, 20.0, 30.0]))
    _stage(1, _pts(spark, 1000, [-30.0, -20.0]))
    _stage(2, _pts(spark, 2000, [-10.0]))

    work = str(tmp_path / "work")
    idx, mon = ivfpq_index_ingest_run(
        spark, feed, work, _frozen_cents(), CB, m=M,
        auto_retrain=True,
    )
    st = ivfpq_index_cell_stats(spark, idx)
    assert not st["retrain"] and st["skew"] < 2.0, st
    assert sum(st["cell_sizes"].values()) == 112
    # the monitor recorded the pre-retrain drift
    monitor = spark.read.parquet(mon).orderBy("batch_id").collect()
    assert monitor[-1]["retrain"], monitor
    log = spark.read.parquet(os.path.join(work, "retrain_log")).collect()
    assert log[0]["skew_before"] > 2.0 > log[0]["skew_after"]

    # the quantizer travels INSIDE the index (swapped atomically with
    # it) and serves the swapped index identically to a from-scratch
    # rebuild under the same centroids
    cents = read_quantizer(spark, os.path.join(idx, "_quantizer"))
    assert len(cents) == 4 and cents != _frozen_cents()
    rebuilt = str(tmp_path / "rebuilt")
    corpus = spark.read.parquet(idx).select("vec_id", "embedding")
    write_ivfpq_index(corpus, cents, CB, rebuilt, m=M)
    assert _stored(spark, idx) == _stored(spark, rebuilt)
    qraw = _pts(spark, 5000, [-25.0, 15.0], n_per=2)

    def serve(p):
        return {
            (r["q_id"], r["rn"]): (r["vec_id"], r["sq_dist"])
            for r in ivfpq_topk_from_index(
                spark, p, qraw, cents, CB, m=M, k=3, nprobe=2,
                shortlist=20,
            ).collect()
        }

    got, want = serve(idx), serve(rebuilt)
    assert got == want and got

    # replay: checkpoint consumed, index balanced -> nothing changes
    before = _stored(spark, idx)
    before_q = cents
    ivfpq_index_ingest_run(
        spark, feed, work, _frozen_cents(), CB, m=M,
        auto_retrain=True,
    )
    assert _stored(spark, idx) == before
    assert read_quantizer(
        spark, os.path.join(idx, "_quantizer")
    ) == before_q


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


def test_retrain_reconciles_concurrent_appends(spark, tmp_path):
    """Appends that land between the retrain's corpus snapshot and its
    atomic swap must survive: the retired copy is reconciled - rows
    absent from the rebuilt index re-append under the NEW quantizers -
    before it is removed (r11 review finding: they previously vanished
    with the retired dir). Simulated by driving the same publish +
    reconcile sequence retrain_ivfpq_index runs, with the append
    injected after the snapshot."""
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        kmeans_fit,
    )

    cents = _frozen_cents()
    path = str(tmp_path / "idx")
    base = _pts(spark, 0, [0.0, 10.0, 20.0, 30.0])
    write_ivfpq_index(base, cents, CB, path, m=M)

    # retrain stages, unrolled: snapshot -> fit -> (concurrent append
    # lands) -> staging build -> swap -> reconcile
    corpus = spark.read.parquet(path).select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    new_cents, _, _ = kmeans_fit(corpus, 4)
    late = _pts(spark, 9000, [5.0], n_per=4)  # lands mid-retrain
    assert append_ivfpq_index(spark, path, late, cents, CB, m=M) == 4

    retired = publish_index(
        spark,
        path,
        lambda staging: write_ivfpq_index(
            corpus, new_cents, CB, staging, m=M
        ),
        replace=True,
        keep_retired=True,
    )
    assert retired is not None and os.path.isdir(retired)
    # pre-reconcile: the rebuilt index lacks the late rows
    ids = {r["vec_id"] for r in spark.read.parquet(path)
           .select("vec_id").collect()}
    assert not any(9000 <= i < 9004 for i in ids)
    # reconcile exactly as retrain_ivfpq_index does
    lost = spark.read.parquet(retired).select(
        "vec_id", "embedding"
    ).join(
        spark.read.parquet(path).select("vec_id"), "vec_id",
        "left_anti",
    )
    assert append_ivfpq_index(
        spark, path, lost, new_cents, CB, m=M
    ) == 4
    ids = {r["vec_id"] for r in spark.read.parquet(path)
           .select("vec_id").collect()}
    assert {9000, 9001, 9002, 9003} <= ids
    # and the full entry point performs the same reconcile end to end
    late2 = _pts(spark, 9500, [6.0], n_per=3)
    append_ivfpq_index(spark, path, late2, new_cents, CB, m=M)
    c2, st = retrain_ivfpq_index(spark, path, CB, m=M, n_cells=4)
    assert sum(st["cell_sizes"].values()) == 64 + 4 + 3


def test_publish_replace_raises_when_lock_lost(spark, tmp_path):
    """A replace publisher that cannot acquire the lock must RAISE -
    silently losing would hand the caller quantizers that disagree
    with the concurrent winner's index (r11 review finding)."""
    import pytest as _pytest

    path = str(tmp_path / "idx")

    def build(staging):
        spark.createDataFrame([(1,)], "v long").coalesce(
            1
        ).write.parquet(staging)

    publish_index(spark, path, build)  # live index exists
    # a FRESH foreign lock occupies the slot; the publisher's short
    # wait expires before the 60s staleness breaker would fire
    with open(path + ".lock", "wb") as fh:
        fh.write(b"foreign-holder")
    try:
        with _pytest.raises(RuntimeError, match="lost the publish lock"):
            publish_index(
                spark, path, build, replace=True, _lock_wait_s=1.0
            )
        # build-once loser stays silent (success-equivalent)
        publish_index(spark, path, build, _lock_wait_s=1.0)
    finally:
        os.remove(path + ".lock")


def test_publish_heals_orphaned_retired_dir(spark, tmp_path):
    """A publisher killed between its two renames leaves no live dir
    but an intact retired copy; the next publisher's critical section
    restores it (r11 review finding: the gap previously required a
    manual rename)."""
    path = str(tmp_path / "idx")

    def build_v(tag):
        def build(staging):
            spark.createDataFrame([(tag,)], "v long").coalesce(
                1
            ).write.parquet(staging)

        return build

    publish_index(spark, path, build_v(1))
    # simulate the crash window: live dir renamed aside, no swap-in
    os.rename(path, path + "_retired_999.1")
    assert not os.path.exists(path)
    # build-once publisher heals: restores the retired copy and treats
    # it as published (never overwrites)
    publish_index(spark, path, build_v(2))
    assert [r["v"] for r in spark.read.parquet(path).collect()] == [1]
    assert not os.path.exists(path + "_retired_999.1")


def test_publish_index_threaded_race_one_winner(spark, tmp_path):
    """Four same-session threads race a build-once publish of the same
    path with distinct payloads: exactly one payload wins, every racer
    returns only after a COMPLETE index exists, and no staging /
    retired / lock leftovers survive (per-call staging names - the r11
    hardening; per-app names made in-session racers build into the
    same staging dir)."""
    import threading

    path = str(tmp_path / "idx")
    errors: list = []

    def racer(tag):
        def build(staging):
            spark.createDataFrame(
                [(tag,)], "v long"
            ).coalesce(1).write.parquet(staging)

        try:
            publish_index(spark, path, build)
        except Exception as e:  # noqa: BLE001 - collected for assert
            errors.append(e)

    threads = [
        threading.Thread(target=racer, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    vals = [r["v"] for r in spark.read.parquet(path).collect()]
    assert len(vals) == 1 and vals[0] in range(4)
    leftovers = [
        d
        for d in os.listdir(tmp_path)
        if d.startswith("idx") and d != "idx"
    ]
    assert leftovers == [], leftovers


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
