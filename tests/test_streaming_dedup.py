"""dedup_stream: an at-least-once feed (a replayed file) must
contribute zero duplicate rows downstream, with state bounded by the
watermark horizon."""

from __future__ import annotations

import glob
import os
import shutil
import time

from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming.incremental import (
    dedup_stream,
    stage_events_dir,
    stream_events,
)


def test_replayed_file_adds_no_duplicates(spark, sf_dir, tmp_path):
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=3)
    # Replay: re-deliver the FIRST file as a new arrival (same rows,
    # later modification time) - the classic at-least-once failure mode.
    parts = sorted(glob.glob(os.path.join(feed, "part-*")))
    replay = os.path.join(feed, "replay-" + os.path.basename(parts[0]))
    shutil.copy(parts[0], replay)
    os.utime(replay, (time.time() + 100, time.time() + 100))

    deduped = dedup_stream(
        stream_events(spark, feed, max_files_per_trigger=1),
        key_cols=("event_id",),
        delay="10 minutes",
    )
    sink = str(tmp_path / "sink")
    q = (
        deduped.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .option("path", sink)
        .start()
    )
    finished = q.awaitTermination(120)
    if not finished:
        q.stop()
        raise TimeoutError("streaming dedup run exceeded 120s")
    assert q.exception() is None

    got = spark.read.parquet(sink)
    n_src = read_table(spark, sf_dir, "events").count()
    # every source row exactly once, despite 1/3 of the feed arriving
    # twice
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src


def test_documents_feed_stream_keepset_equals_batch(spark, sf_dir, tmp_path):
    """Stream==batch discipline for the LLM-ingestion dedup (VERDICT
    r04 #8): a documents feed with content-duplicate clones arriving in
    a later file must keep exactly the batch first-arrival keep-set -
    the originals - with every clone dropped by content digest."""
    import datetime as dt

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        dedup_stream,
    )

    base = dt.datetime(2024, 1, 1)
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn(
            "arrival_ts",
            F.lit(base) + F.make_interval(secs=F.col("doc_id")),
        )
    )
    # clones: same text, new ids, arriving AFTER every original
    clones = docs.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        "text",
        (F.col("arrival_ts") + F.expr("INTERVAL 1000 SECONDS")).alias(
            "arrival_ts"
        ),
    ).where(F.col("doc_id") < 10050)
    feed = str(tmp_path / "docfeed")
    half = docs.count() // 2
    order = [
        docs.where(F.col("doc_id") < half),
        docs.where(F.col("doc_id") >= half),
        clones,
    ]
    import os
    import time

    os.makedirs(feed)
    now = time.time()
    for i, frame in enumerate(order):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, arrival_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(feed)
        .withColumn("digest", F.md5("text"))
    )
    deduped = dedup_stream(
        stream, key_cols=("digest",), ts_col="arrival_ts", delay="2 hours"
    )
    sink = str(tmp_path / "docsink")
    q = (
        deduped.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "docckpt"))
        .format("parquet")
        .option("path", sink)
        .start()
    )
    finished = q.awaitTermination(120)
    if not finished:
        q.stop()
        raise TimeoutError("streaming doc dedup exceeded 120s")
    assert q.exception() is None

    # batch twin: first arrival per digest == exactly the originals
    batch_keep = {r.doc_id for r in docs.collect()}
    stream_keep = {
        r.doc_id for r in spark.read.parquet(sink).select("doc_id").collect()
    }
    assert stream_keep == batch_keep


def test_neardup_ingest_stream_equals_sequential_batch(
    spark, sf_dir, tmp_path
):
    """Online near-dup ingestion (neardup_ingest_run) must keep exactly
    the set a sequential batch fold keeps: per file, drop docs with a
    smaller-id near-dup batchmate, then docs near-dup'ing anything
    already kept; survivors join the corpus + index. Planted near-dups
    (suffix-token clones, Jaccard >> 0.5) span files so the cross-batch
    index path is actually exercised."""
    import os

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.dedup import (
        build_minhash_index,
        minhash_delta_pairs,
        minhash_neardup_pairs,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        neardup_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    # suffix-token clones -> true near-dups of their source docs.
    # Set A clones file-0 docs (source arrives BEFORE the clone: clone
    # must drop via the stored index). Set B clones file-2 docs (clone
    # arrives FIRST: clone kept, the later original drops).
    def clone(pred):
        return docs.where(pred).select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit("clonemark")).alias(
                "text"
            ),
        )

    clones_a = clone(F.col("doc_id") < 20)
    b_lo = 2 * n // 3
    clones_b = clone((F.col("doc_id") >= b_lo) & (F.col("doc_id") < b_lo + 20))
    files = [
        docs.where(F.col("doc_id") < n // 3),
        docs.where(
            (F.col("doc_id") >= n // 3) & (F.col("doc_id") < 2 * n // 3)
        )
        .unionByName(clones_a)
        .unionByName(clones_b),
        docs.where(F.col("doc_id") >= 2 * n // 3),
    ]
    feed = str(tmp_path / "nd_feed")
    os.makedirs(feed)
    import time as _time

    now = _time.time()
    for i, frame in enumerate(files):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    work = str(tmp_path / "nd_work")
    neardup_ingest_run(spark, feed, work, threshold=0.5)
    stream_kept = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(work, "kept")).collect()
    }

    # sequential batch fold, same per-file rule
    kept_frames = []
    index = None
    for frame in files:
        self_pairs = minhash_neardup_pairs(frame, threshold=0.5)
        survivors = frame.join(
            self_pairs.select(F.col("id_b").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        if index is not None:
            hits = (
                minhash_delta_pairs(survivors, index, threshold=0.5)
                .select(F.col("delta_id").alias("doc_id"))
                .distinct()
            )
            survivors = survivors.join(hits, "doc_id", "left_anti")
        survivors = survivors.localCheckpoint(eager=True)
        kept_frames.append(survivors)
        add = build_minhash_index(survivors, persist=False)
        if index is None:
            index = add
        else:
            index = {
                k: index[k].unionByName(add[k]).localCheckpoint(eager=True)
                for k in index
            }
    batch_kept = {
        r.doc_id for kf in kept_frames for r in kf.select("doc_id").collect()
    }

    assert stream_kept == batch_kept
    # the planted dups actually exercised both paths: every set-A clone
    # (source already in the corpus) dropped via the stored index...
    assert not any(10000 <= d < 10020 for d in stream_kept), sorted(
        d for d in stream_kept if 10000 <= d < 10020
    )
    # ...and first-arrival wins across files: some set-B clones were
    # kept (their sources had not arrived), and each kept clone's
    # later-arriving source was then dropped against the index
    kept_b = {d for d in stream_kept if d >= 10000 + b_lo}
    assert kept_b, "no cross-file first-arrival case exercised"
    for d in kept_b:
        assert d - 10000 not in stream_kept

    # crash-retry idempotency: wipe the stream checkpoint so every file
    # replays as a fresh batch - the committed-batch marker must make
    # the replay a no-op (at-least-once foreachBatch, exactly-once sink)
    import shutil

    shutil.rmtree(os.path.join(work, "ckpt"))
    neardup_ingest_run(spark, feed, work, threshold=0.5)
    again = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(work, "kept")).collect()
    }
    kept_rows = spark.read.parquet(os.path.join(work, "kept")).count()
    assert again == stream_kept
    assert kept_rows == len(stream_kept)


def test_ingest_with_derived_curation_sinks(spark, sf_dir, tmp_path):
    """The full curation pipeline rides the ingest loop: per batch,
    survivors are quality-filtered, PII-redacted, and chunked into a
    training-shard sink under the same exactly-once layout. The
    derived sink must equal applying the same transforms to the final
    kept corpus in batch."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        chunk_documents,
        gopher_quality_flags,
        redact_pii,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        neardup_ingest_run,
    )

    def curate(df):
        keep_ids = (
            gopher_quality_flags(df).where(F.col("keep")).select("doc_id")
        )
        ok = df.join(keep_ids, "doc_id", "left_semi")
        red = redact_pii(ok).select(
            "doc_id", F.col("text_redacted").alias("text")
        )
        return chunk_documents(red, chunk_tokens=64, overlap=16)

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    files = [
        docs.where(F.col("doc_id") < n // 2),
        docs.where(F.col("doc_id") >= n // 2),
    ]
    feed = str(tmp_path / "cur_feed")
    os.makedirs(feed)
    now = _time.time()
    for i, frame in enumerate(files):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    work = str(tmp_path / "cur_work")
    neardup_ingest_run(
        spark, feed, work, threshold=0.5, derived_sinks={"chunks": curate}
    )
    kept = spark.read.parquet(os.path.join(work, "kept")).select(
        "doc_id", "text"
    )
    stream_chunks = {
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in spark.read.parquet(os.path.join(work, "chunks")).collect()
    }
    batch_chunks = {
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in curate(kept).collect()
    }
    assert stream_chunks == batch_chunks
    assert stream_chunks  # the pipeline actually produced shards


def test_derived_sink_reserved_names_rejected(spark, tmp_path):
    import pytest

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        neardup_ingest_run,
    )

    for bad in ("kept", "index_bands", "ckpt", "x/y"):
        with pytest.raises(ValueError, match="collides|escapes"):
            neardup_ingest_run(
                spark,
                str(tmp_path / "feed"),
                str(tmp_path / "work"),
                derived_sinks={bad: lambda df: df},
            )


def test_line_dedup_ingest_equals_batch_fold(spark, sf_dir, tmp_path):
    """Online line dedup at ingest: with the feed staged in doc-id
    order, the streamed fold must equal batch dedup_lines over the
    whole corpus; re-running the stream (same checkpoint, no new
    files) must change nothing."""
    import pyspark.sql.functions as F

    from txf_continuous_data_pipeline_spark.operators.dedup import (
        dedup_lines,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        line_dedup_ingest_run,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.concat_ws(
                "\n", F.col("text"), F.lit("shared boilerplate footer")
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    feed = str(tmp_path / "feed")
    # three id-ordered files, mtime-staggered like stage_events_dir
    cuts = [0, n // 3, 2 * n // 3, n]
    now = time.time()
    for i in range(3):
        d = os.path.join(feed, f"f{i}")
        docs.where(
            (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(os.path.join(d, "part-*")):
            os.utime(f, (now + 2 * i, now + 2 * i))

    work = str(tmp_path / "work")
    kept = line_dedup_ingest_run(spark, feed, work)
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_removed"])
        for r in spark.read.parquet(os.path.join(kept, "*")).collect()
    }
    want = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_removed"])
        for r in dedup_lines(docs).collect()
    }
    assert got == want and len(got) == n
    # the planted footer survives exactly once, in the first doc
    carriers = [d for d, (t, _n, _r) in got.items()
                if "shared boilerplate footer" in t]
    assert carriers == [min(got)]

    # idempotent rerun: same checkpoint, no new files -> identical sink
    line_dedup_ingest_run(spark, feed, work)
    again = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_removed"])
        for r in spark.read.parquet(os.path.join(kept, "*")).collect()
    }
    assert again == got


def test_sample_maintain_stream_equals_batch_bottomk(
    spark, sf_dir, tmp_path
):
    """The maintained sample (bottom-k over per-batch candidate sets)
    must equal the batch bottomk_sample over the whole corpus, and a
    stream re-run with the same checkpoint must change nothing."""
    import pyspark.sql.functions as F

    from txf_continuous_data_pipeline_spark.queries import REGISTRY
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        read_current_sample,
        sample_maintain_run,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    n = docs.count()
    feed = str(tmp_path / "feed")
    cuts = [0, n // 3, 2 * n // 3, n]
    now = time.time()
    for i in range(3):
        d = os.path.join(feed, f"f{i}")
        docs.where(
            (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
        ).coalesce(1).write.mode("overwrite").parquet(d)
        for f in glob.glob(os.path.join(d, "part-*")):
            os.utime(f, (now + 2 * i, now + 2 * i))

    work = str(tmp_path / "work")
    sample_maintain_run(spark, feed, work)
    got = [
        (r["doc_id"], r["source"], r["lang"], r["sample_key"])
        for r in read_current_sample(spark, work).collect()
    ]
    want = [
        (r["doc_id"], r["source"], r["lang"], r["sample_key"])
        for r in REGISTRY["bottomk_sample"][0](spark, sf_dir).collect()
    ]
    assert got == want and len(got) == 50
    # re-run: same checkpoint, no new files -> candidates unchanged
    before = sorted(
        glob.glob(os.path.join(work, "sample_candidates", "*", "part-*"))
    )
    sample_maintain_run(spark, feed, work)
    after = sorted(
        glob.glob(os.path.join(work, "sample_candidates", "*", "part-*"))
    )
    assert [os.path.dirname(p) for p in before] == [
        os.path.dirname(p) for p in after
    ]
    got2 = [
        (r["doc_id"], r["source"], r["lang"], r["sample_key"])
        for r in read_current_sample(spark, work).collect()
    ]
    assert got2 == want


def test_read_current_sample_empty_feed_yields_empty_not_crash(
    spark, tmp_path
):
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        read_current_sample,
    )

    out = read_current_sample(spark, str(tmp_path / "nowhere"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "source", "lang", "sample_key"]


def test_compact_batch_store_preserves_ingest_semantics(
    spark, sf_dir, tmp_path
):
    """compact_batch_store: rolling the index's batch dirs into one
    rollup partition must change NOTHING the ingest loop computes -
    a post-compaction batch reads the rollup as its earlier-snapshot
    stand-in and keeps exactly what the uncompacted twin keeps - and
    the rollup must actually shrink the directory count. Wholesale
    readers keep working (negative batch id keeps the partition
    column integer-typed)."""
    import time as _time

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        compact_batch_store,
        neardup_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()

    # planted cross-batch dups: file-2 docs cloning file-0 docs must
    # drop via the (compacted) stored index
    def clone(pred):
        return docs.where(pred).select(
            (F.col("doc_id") + 50000).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit("rollmark")).alias(
                "text"
            ),
        )

    files = [
        docs.where(F.col("doc_id") < n // 3),
        docs.where(
            (F.col("doc_id") >= n // 3) & (F.col("doc_id") < 2 * n // 3)
        ),
        docs.where(F.col("doc_id") >= 2 * n // 3).unionByName(
            clone(F.col("doc_id") < 20)
        ),
    ]

    def stage(feed):
        os.makedirs(feed)
        now = _time.time()
        for i, frame in enumerate(files):
            fp = os.path.join(feed, f"f{i}")
            frame.coalesce(1).write.mode("overwrite").parquet(fp)
            for part in os.listdir(fp):
                os.utime(
                    os.path.join(fp, part), (now + i * 10, now + i * 10)
                )
        return feed

    # twin A: feed first two files, compact the index through batch 1,
    # then deliver file 2 (its dedup must read the rollup)
    feed_a = stage(str(tmp_path / "cmp_feed_a"))
    work_a = str(tmp_path / "cmp_work_a")
    # hold back file 2 by staging it late: run over the 2-file prefix
    f2 = os.path.join(feed_a, "f2")
    hidden = str(tmp_path / "hidden_f2")
    os.rename(f2, hidden)
    neardup_ingest_run(spark, feed_a, work_a, threshold=0.5)
    for store in ("index_bands", "index_shingles"):
        rolled = compact_batch_store(
            spark, os.path.join(work_a, store), upto=1
        )
        assert rolled >= 1
        dirs = [
            d
            for d in os.listdir(os.path.join(work_a, store))
            if d.startswith("batch=")
        ]
        assert dirs == ["batch=-2"], dirs
    os.rename(hidden, f2)
    neardup_ingest_run(spark, feed_a, work_a, threshold=0.5)
    kept_a = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(work_a, "kept")).collect()
    }

    # twin B: identical feed, never compacted
    feed_b = stage(str(tmp_path / "cmp_feed_b"))
    work_b = str(tmp_path / "cmp_work_b")
    neardup_ingest_run(spark, feed_b, work_b, threshold=0.5)
    kept_b = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(work_b, "kept")).collect()
    }
    assert kept_a == kept_b
    # the planted clones exercised the rollup read: all dropped
    assert not any(d >= 50000 for d in kept_a)

    # wholesale read across rollup + live dirs still works and the
    # inferred batch partition column stays integer-typed
    whole = spark.read.parquet(os.path.join(work_a, "index_bands"))
    assert dict(whole.dtypes)["batch"] in ("int", "bigint")

    # idempotent re-run: only garbage collection, content unchanged
    n_rows = whole.count()
    compact_batch_store(
        spark, os.path.join(work_a, "index_bands"), upto=1
    )
    assert (
        spark.read.parquet(os.path.join(work_a, "index_bands")).count()
        == n_rows
    )


def test_compact_batch_store_crash_windows(spark, tmp_path):
    """r10 review wave 4: the compactor's crash-safety corners.
    (a) a stale victim dir surviving a previous rollup's GC (crash
    between commit and delete) must NOT double-count into the next
    rollup; (b) _SUCCESS-only victim dirs are garbage-collected even
    when nothing needs rolling up; (c) stale staging dirs from ANY
    earlier crashed attempt are removed; (d) a replayed batch whose
    output the rollup covers raises loudly instead of reading itself."""
    import shutil

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        _earlier_batch_dirs,
        compact_batch_store,
    )

    store = str(tmp_path / "store")
    for bid, vals in ((0, [1, 2]), (1, [3]), (2, [4, 5, 6])):
        spark.createDataFrame(
            [(v,) for v in vals], "x long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store, f"batch={bid}")
        )

    # (a) compact through 1, then resurrect batch=0 as failed-GC debris
    saved = str(tmp_path / "saved_b0")
    shutil.copytree(os.path.join(store, "batch=0"), saved)
    compact_batch_store(spark, store, upto=1)
    shutil.copytree(saved, os.path.join(store, "batch=0"))
    # plant a stale staging leftover from a fictional crashed attempt
    os.makedirs(store + "__rollup_7_staging")
    compact_batch_store(spark, store, upto=2)
    rows = sorted(
        r["x"] for r in spark.read.parquet(store).select("x").collect()
    )
    assert rows == [1, 2, 3, 4, 5, 6], rows  # no double count
    assert not os.path.exists(store + "__rollup_7_staging")  # (c)
    assert sorted(
        d for d in os.listdir(store) if d.startswith("batch=")
    ) == ["batch=-3"]

    # (d) a replayed batch the rollup covers fails loudly
    import pytest

    with pytest.raises(RuntimeError, match="compacted through"):
        _earlier_batch_dirs(store, bid=1)
    # while a genuinely-later batch reads the rollup as its snapshot
    assert _earlier_batch_dirs(store, bid=3) == [
        os.path.join(store, "batch=-3")
    ]

    # (b) _SUCCESS-only dirs still get collected
    store2 = str(tmp_path / "store2")
    for bid in (0, 1):
        d = os.path.join(store2, f"batch={bid}")
        os.makedirs(d)
        open(os.path.join(d, "_SUCCESS"), "w").close()
    n = compact_batch_store(spark, store2, upto=1)
    assert n == 2
    assert not any(
        x.startswith("batch=") for x in os.listdir(store2)
    )
