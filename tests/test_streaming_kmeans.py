"""Streaming k-means differential: the availableNow foreachBatch fold
must equal a single-process numpy replay of the same decayed
sufficient-statistics rule over the same file order, and decay < 1
must let centroids track planted drift."""

from __future__ import annotations

import glob
import os
import time

import numpy as np
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming.incremental import (
    streaming_kmeans_run,
)

K = 4


def _seeds(emb):
    rows = (
        emb.where(F.col("vec_id") < K)
        .select("vec_id", "embedding")
        .collect()
    )
    return sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )


def _stage(corpus, feed, n_files=3):
    for i in range(n_files):
        part = corpus.where(F.col("vec_id") % n_files == i).coalesce(1)
        d = os.path.join(feed, f"b{i}")
        part.write.mode("overwrite").parquet(d)
        later = time.time() + i * 2
        for f in glob.glob(os.path.join(d, "*.parquet")):
            os.utime(f, (later, later))


def _replay(files_by_batch, seeds, decay):
    S = np.array([v for _c, v in seeds])
    N = np.ones(len(seeds))
    for X in files_by_batch:
        C = S / N[:, None]
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        S, N = decay * S, decay * N
        for c in range(len(seeds)):
            m = a == c
            if m.any():
                S[c] += X[m].sum(0)
                N[c] += m.sum()
    return S / N[:, None]


def test_streaming_kmeans_matches_numpy_replay(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    seeds = _seeds(emb)
    corpus = emb.where(F.col("vec_id") >= K).select("vec_id", "embedding")
    feed = str(tmp_path / "feed")
    _stage(corpus, feed)

    state = streaming_kmeans_run(
        spark, feed, str(tmp_path / "work"), seeds, decay=0.5
    )
    rows = sorted(
        spark.read.parquet(state).collect(),
        key=lambda r: r["cluster_id"],
    )
    got = np.array(
        [np.array(r["csum"]) / r["cnt"] for r in rows]
    )

    batches = []
    for i in range(3):
        pdf = (
            corpus.where(F.col("vec_id") % 3 == i)
            .orderBy("vec_id")
            .collect()
        )
        batches.append(
            np.array([r["embedding"] for r in pdf], dtype=np.float64)
        )
    want = _replay(batches, seeds, decay=0.5)
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_streaming_kmeans_rerun_is_noop_and_tracks_drift(
    spark, sf_dir, tmp_path
):
    emb = read_table(spark, sf_dir, "embeddings")
    seeds = _seeds(emb)
    corpus = emb.where(F.col("vec_id") >= K).select("vec_id", "embedding")
    feed = str(tmp_path / "feed")
    _stage(corpus, feed)
    work = str(tmp_path / "work")
    state = streaming_kmeans_run(spark, feed, work, seeds, decay=0.5)
    first = {
        r["cluster_id"]: (tuple(r["csum"]), r["cnt"], r["last_batch"])
        for r in spark.read.parquet(state).collect()
    }
    # same checkpoint, no new files -> nothing re-folds
    streaming_kmeans_run(spark, feed, work, seeds, decay=0.5)
    again = {
        r["cluster_id"]: (tuple(r["csum"]), r["cnt"], r["last_batch"])
        for r in spark.read.parquet(state).collect()
    }
    assert first == again

    # planted drift: a heavy far-away batch must pull SOME centroid
    # hard when decay forgets fast
    far = spark.createDataFrame(
        [(10_000 + i, [50.0] * 64) for i in range(200)],
        "vec_id long, embedding array<float>",
    ).coalesce(1)
    d = os.path.join(feed, "b9")
    far.write.mode("overwrite").parquet(d)
    later = time.time() + 60
    for f in glob.glob(os.path.join(d, "*.parquet")):
        os.utime(f, (later, later))
    state = streaming_kmeans_run(spark, feed, work, seeds, decay=0.2)
    rows = spark.read.parquet(state).collect()
    cents = [np.array(r["csum"]) / r["cnt"] for r in rows]
    best = min(np.abs(c - 50.0).max() for c in cents)
    # decayed prior mass (~0.2 * accumulated count) bounds the pull:
    # (0.2*N*c_old + 200*50) / (0.2*N + 200) lands within ~6 of 50 for
    # this corpus - the data centroids sit near 0.5, so < 10 proves the
    # winner crossed essentially the whole gap
    assert best < 10.0, best


def test_drift_monitor_trips_on_planted_shift(spark, sf_dir, tmp_path):
    """Stationary feed batches stay under the PSI trip threshold; a
    planted value-shifted batch must trip; redelivery (fresh
    checkpoint, same feed) appends no duplicate log rows."""
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        drift_monitor_run,
        stage_events_dir,
    )

    events = read_table(spark, sf_dir, "events")
    ref = events.select("value")
    feed = str(tmp_path / "feed")
    stage_events_dir(spark, sf_dir, feed, n_files=2)

    # planted drift: same schema, values shifted far right
    import glob as _glob
    import os as _os

    shifted = events.limit(500).withColumn(
        "value", F.col("value") + F.lit(250.0)
    )
    d = _os.path.join(feed, "zz_shift")
    shifted.coalesce(1).write.mode("overwrite").parquet(d)
    later = time.time() + 60
    for f in _glob.glob(_os.path.join(d, "*.parquet")):
        _os.utime(f, (later, later))

    work = str(tmp_path / "work")
    log = drift_monitor_run(
        spark, feed, work, ref, value_col="value", lo=0.0, hi=200.0
    )
    rows = sorted(
        spark.read.parquet(log).collect(), key=lambda r: r["batch_id"]
    )
    assert len(rows) == 3
    assert [r["tripped"] for r in rows[:-1]] == [False, False]
    assert rows[-1]["tripped"] and rows[-1]["psi"] > 0.25

    # fresh checkpoint = full redelivery; the log must not grow
    import shutil

    shutil.rmtree(_os.path.join(work, "ckpt"))
    drift_monitor_run(
        spark, feed, work, ref, value_col="value", lo=0.0, hi=200.0
    )
    assert spark.read.parquet(log).count() == 3


def test_partial_state_raises_instead_of_silent_reseed(
    spark, tmp_path
):
    """A state dir that exists but holds the wrong number of cluster
    rows (crash mid-overwrite) must raise, not silently reseed over
    committed batches."""
    import glob
    import time

    import pytest

    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("append").parquet(feed)
    work = str(tmp_path / "work")
    seeds = [(0, [0.0, 0.0]), (1, [2.0, 4.0])]
    streaming_kmeans_run(spark, feed, work, seed_centroids=seeds)
    state = os.path.join(work, "kmeans_state")
    rows = spark.read.parquet(state).collect()
    assert len(rows) == 2
    # corrupt: keep only one cluster row
    spark.createDataFrame(
        [r for r in rows if r["cluster_id"] == 0],
        spark.read.parquet(state).schema,
    ).coalesce(1).write.mode("overwrite").parquet(state)
    # new file so a batch actually fires against the corrupt state
    spark.createDataFrame(
        [(100 + i, [1.0, 1.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("append").parquet(feed)
    now = time.time()
    for f in glob.glob(os.path.join(feed, "part-*")):
        os.utime(f, (now, now))
    with pytest.raises(Exception, match="corrupt"):
        streaming_kmeans_run(
            spark, feed, work, seed_centroids=seeds
        )


def test_pca_stats_stream_equals_batch_fit(spark, sf_dir, tmp_path):
    """pca_stats_run: the stream-maintained spectrum must equal batch
    pca_fit over the union corpus (the statistics are algebraically
    additive, so agreement is to fp-summation noise, not an
    approximation bound), and a checkpoint-wiped replay must rewrite
    its batch partitions, leaving the spectrum identical."""
    import shutil

    from txf_continuous_data_pipeline_spark.operators.similarity import (
        pca_fit,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        pca_stats_run,
        read_current_spectrum,
    )

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
        "label",
    )
    n = emb.count()
    files = [
        emb.where(F.col("vec_id") < n // 3),
        emb.where(
            (F.col("vec_id") >= n // 3) & (F.col("vec_id") < 2 * n // 3)
        ),
        emb.where(F.col("vec_id") >= 2 * n // 3),
    ]
    feed = str(tmp_path / "pca_feed")
    os.makedirs(feed)
    now = time.time()
    for i, frame in enumerate(files):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    work = str(tmp_path / "pca_work")
    pca_stats_run(spark, feed, work)
    eigs, total = read_current_spectrum(spark, work, k=8)

    _m, _c, ref_eigs, ref_total = pca_fit(emb, k=8, with_total_var=True)
    assert np.allclose(eigs, ref_eigs, rtol=1e-9, atol=1e-12)
    assert np.isclose(total, ref_total, rtol=1e-9)
    # the stats store is batch-bounded, never corpus-bounded
    stats_rows = spark.read.parquet(os.path.join(work, "stats")).count()
    assert stats_rows <= 3 * 8  # n_batches x partitions, tiny

    # replay idempotence: wipe the checkpoint, re-run, same spectrum
    shutil.rmtree(os.path.join(work, "ckpt"))
    pca_stats_run(spark, feed, work)
    eigs2, total2 = read_current_spectrum(spark, work, k=8)
    assert np.allclose(eigs2, eigs, rtol=0, atol=0)  # byte-identical
    assert total2 == total
