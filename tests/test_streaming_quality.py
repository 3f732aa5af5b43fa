"""quality_filter_ingest_run: the streaming quality gate must split
the corpus exactly as the batch serving path does (stream == batch),
quarantine rejected rows with their scores instead of dropping them,
and rewrite - not double-append - on checkpoint replay."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    hashing_trick_embed,
    logreg_score,
)
from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming.incremental import (
    quality_filter_ingest_run,
)

WEIGHTS = [((7 * i) % 13 - 6) / 10.0 for i in range(64)]
BIAS = -0.1


def _stage_docs_feed(spark, sf_dir, feed: str, n_files: int = 3) -> str:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # deterministic file split so batch order is stable across runs
    for i in range(n_files):
        docs.where(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
    return feed


def test_stream_split_equals_batch_scoring(spark, sf_dir, tmp_path):
    feed = _stage_docs_feed(spark, sf_dir, str(tmp_path / "feed"))
    kept_dir, quar_dir = quality_filter_ingest_run(
        spark, feed, str(tmp_path / "work"), WEIGHTS, BIAS
    )

    docs = read_table(spark, sf_dir, "documents")
    ref = logreg_score(hashing_trick_embed(docs, dim=64), WEIGHTS, BIAS)
    ref_kept = {
        r.doc_id for r in ref.where(F.col("score") >= 0.5).collect()
    }
    ref_scores = {r.doc_id: r.score for r in ref.collect()}

    kept = spark.read.parquet(kept_dir)
    quar = spark.read.parquet(quar_dir)
    assert {r.doc_id for r in kept.collect()} == ref_kept
    # quarantine = exact complement, auditable with scores
    assert {r.doc_id for r in quar.collect()} == (
        set(ref_scores) - ref_kept
    )
    got_scores = {
        r.doc_id: r.score
        for r in kept.unionByName(quar).collect()
    }
    assert got_scores == ref_scores


def test_rerun_rewrites_instead_of_double_appending(spark, sf_dir, tmp_path):
    feed = _stage_docs_feed(spark, sf_dir, str(tmp_path / "feed"))
    work = str(tmp_path / "work")
    kept_dir, quar_dir = quality_filter_ingest_run(
        spark, feed, work, WEIGHTS, BIAS
    )
    n_kept = spark.read.parquet(kept_dir).count()
    n_quar = spark.read.parquet(quar_dir).count()
    # replay against the same checkpoint: availableNow sees no new
    # files, so counts must not move; a second FULL redelivery (fresh
    # checkpoint, same batch ids) rewrites the same partitions
    quality_filter_ingest_run(spark, feed, work, WEIGHTS, BIAS)
    assert spark.read.parquet(kept_dir).count() == n_kept
    import shutil

    shutil.rmtree(os.path.join(work, "ckpt"))
    quality_filter_ingest_run(spark, feed, work, WEIGHTS, BIAS)
    assert spark.read.parquet(kept_dir).count() == n_kept
    assert spark.read.parquet(quar_dir).count() == n_quar


def test_unscorable_rows_quarantine_not_vanish(spark, tmp_path):
    """A row the featurizer cannot score (null text -> no feature row)
    must land in quarantine with a null score - never silently vanish
    from both sinks (the auditability contract)."""
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(1, "spark filter join group"), (2, None), (3, "")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(feed)
    kept_dir, quar_dir = quality_filter_ingest_run(
        spark, feed, str(tmp_path / "work"), WEIGHTS, BIAS
    )
    kept = spark.read.parquet(os.path.join(kept_dir, "*")).collect()
    quar = spark.read.parquet(os.path.join(quar_dir, "*")).collect()
    all_ids = {r["doc_id"] for r in kept} | {r["doc_id"] for r in quar}
    assert all_ids == {1, 2, 3}  # nothing vanished
    by_id = {r["doc_id"]: r for r in quar}
    assert 2 in by_id and by_id[2]["score"] is None


def test_web_funnel_ingest_equals_sequential_batch_fold(
    spark, sf_dir, tmp_path
):
    """web_funnel_ingest_run (VERDICT r9 #4): the streaming funnel's
    per-batch monitor rows and kept set must equal a sequential batch
    fold of the same stages (blocklist -> prefix-adaptive p25 cutoff
    -> greedy first-arrival near-dup) over the same feed, and a
    checkpoint-wiped replay must rewrite, not double-append."""
    import shutil
    import time as _time

    from txf_continuous_data_pipeline_spark.operators.dedup import (
        build_minhash_index,
        minhash_delta_pairs,
        minhash_neardup_pairs,
    )
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        quality_score,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        web_funnel_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    n = docs.count()
    files = [
        docs.where(F.col("doc_id") < n // 3),
        docs.where(
            (F.col("doc_id") >= n // 3) & (F.col("doc_id") < 2 * n // 3)
        ),
        docs.where(F.col("doc_id") >= 2 * n // 3),
    ]
    feed = str(tmp_path / "wf_feed")
    os.makedirs(feed)
    now = _time.time()
    for i, frame in enumerate(files):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    work = str(tmp_path / "wf_work")
    funnel_dir = web_funnel_ingest_run(spark, feed, work)
    stream_funnel = {
        (r.batch_id, r.stage_idx, r.stage): r.n_docs
        for r in spark.read.parquet(funnel_dir).collect()
    }
    stream_kept = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(work, "kept")).collect()
    }

    # sequential batch fold, same per-batch semantics
    fold_funnel = {}
    kept_ids = set()
    seen_scores = None
    index = None
    for bid, frame in enumerate(files):
        n0 = frame.count()
        d1 = frame.where(~F.col("source").isin("src2", "src3"))
        sc = d1.select(
            "doc_id",
            "source",
            "text",
            F.round(quality_score(F.col("text")), 6).alias("score"),
        ).localCheckpoint(eager=True)
        n1 = d1.count()
        seen = sc.select("source", "score")
        if seen_scores is not None:
            seen = seen.unionByName(seen_scores)
        cut = seen.groupBy("source").agg(
            F.round(
                F.percentile(F.col("score"), F.lit(0.25)), 6
            ).alias("cutoff")
        )
        d2 = (
            sc.join(F.broadcast(cut), "source")
            .where(F.col("score") >= F.col("cutoff"))
            .select("doc_id", "source", "text")
            .localCheckpoint(eager=True)
        )
        n2 = d2.count()
        self_pairs = minhash_neardup_pairs(d2, threshold=0.5)
        survivors = d2.join(
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
        n3 = survivors.count()
        kept_ids |= {r.doc_id for r in survivors.select("doc_id").collect()}
        seen_scores = (
            seen.localCheckpoint(eager=True)
        )
        add = build_minhash_index(survivors, persist=False)
        if index is None:
            index = add
        else:
            index = {
                k: index[k].unionByName(add[k]).localCheckpoint(eager=True)
                for k in index
            }
        fold_funnel.update(
            {
                (bid, 0, "ingest"): n0,
                (bid, 1, "domain_blocklist"): n1,
                (bid, 2, "quality_cutoff"): n2,
                (bid, 3, "neardup_keep"): n3,
            }
        )

    assert stream_funnel == fold_funnel
    assert stream_kept == kept_ids
    # stage monotonicity within each batch: the funnel only narrows
    for bid in {k[0] for k in stream_funnel}:
        seq = [stream_funnel[(bid, i, s)] for i, s in
               [(0, "ingest"), (1, "domain_blocklist"),
                (2, "quality_cutoff"), (3, "neardup_keep")]]
        assert seq == sorted(seq, reverse=True)

    # crash-retry idempotency: wipe the checkpoint so every file
    # replays - committed batch partitions must be rewritten in place
    shutil.rmtree(os.path.join(work, "ckpt"))
    web_funnel_ingest_run(spark, feed, work)
    again_funnel = {
        (r.batch_id, r.stage_idx, r.stage): r.n_docs
        for r in spark.read.parquet(funnel_dir).collect()
    }
    again_kept = spark.read.parquet(os.path.join(work, "kept"))
    assert again_funnel == stream_funnel
    assert {r.doc_id for r in again_kept.collect()} == stream_kept
    assert again_kept.count() == len(stream_kept)


def test_budgeted_ingest_equals_fold_and_respects_budgets(
    spark, sf_dir, tmp_path
):
    """budgeted_ingest_run: per-source prefix admission under a token
    budget must equal a sequential batch fold of the same rule, never
    exceed any budget, backfill a cutoff gap from later batches, and
    replay to the identical kept set."""
    import shutil
    import time as _time

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        token_count,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        budgeted_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    n = docs.count()
    files = [
        docs.where(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    feed = str(tmp_path / "bud_feed")
    os.makedirs(feed)
    now = _time.time()
    for i, frame in enumerate(files):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    # budgets sized to bite mid-stream: src0's budget admits ALL of
    # batch 0 plus a strict partial prefix of batch 1 (so the
    # backfill-across-batches path provably runs), src1 generous,
    # src2 zero via default, others medium
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    b0_total, b1_first = (
        files[0]
        .where(F.col("source") == "src0")
        .agg(F.sum(token_count(F.col("text")).cast("long")))
        .first()[0],
        files[1]
        .where(F.col("source") == "src0")
        .orderBy("doc_id")
        .select(token_count(F.col("text")).cast("long").alias("nt"))
        .first()["nt"],
    )
    budgets = {}
    for s in sorted(sources):
        i = int(s.replace("src", ""))
        if i == 2:
            continue  # falls to default_budget=0 -> fully dropped
        budgets[s] = (
            int(b0_total) + int(b1_first)
            if i == 0
            else 2000 if i == 1 else 800
        )

    work = str(tmp_path / "bud_work")
    kept_dir = budgeted_ingest_run(spark, feed, work, budgets)
    kept = spark.read.parquet(kept_dir)
    stream_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    # budgets respected, zero-budget source absent
    totals = {
        r["source"]: r["t"]
        for r in kept.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    for s, t in totals.items():
        assert t <= budgets.get(s, 0), (s, t)
    assert "src2" not in totals

    # sequential fold twin: same prefix rule with batch operators
    spent: dict = {}
    fold_ids = set()
    for frame in files:
        rows = (
            frame.select(
                "doc_id",
                "source",
                token_count(F.col("text")).cast("long").alias("nt"),
            )
            .orderBy("source", "doc_id")
            .collect()
        )
        pref: dict = {}
        adm: dict = {}
        for r in rows:
            s = r["source"]
            pref[s] = pref.get(s, 0) + r["nt"]
            if spent.get(s, 0) + pref[s] <= budgets.get(s, 0):
                fold_ids.add(r["doc_id"])
                adm[s] = adm.get(s, 0) + r["nt"]
        # ledger semantics: only ADMITTED tokens roll into spent
        for s, t in adm.items():
            spent[s] = spent.get(s, 0) + t

    assert stream_ids == fold_ids
    # the tight budget actually cut mid-corpus AND got backfilled:
    # src0 kept docs from more than one batch
    src0_kept = {
        r["doc_id"]
        for r in kept.where(F.col("source") == "src0").collect()
    }
    assert src0_kept, "src0 budget admitted nothing - test is vacuous"
    batches_hit = {d % 3 for d in src0_kept}
    assert len(batches_hit) > 1, (
        f"src0 admissions all in one batch {batches_hit} - "
        "backfill never exercised; loosen the budget"
    )

    # replay: wipe the checkpoint, rerun - identical kept set, no dupes
    shutil.rmtree(os.path.join(work, "ckpt"))
    budgeted_ingest_run(spark, feed, work, budgets)
    again = spark.read.parquet(kept_dir)
    assert {r["doc_id"] for r in again.collect()} == stream_ids
    assert again.count() == len(stream_ids)


def test_budgeted_ingest_quarantines_null_text(spark, tmp_path):
    """A NULL-text row has no token count: the admission predicate
    would NULL out and silently drop it (r10 review wave 3) - it must
    land in the quarantine partition instead, without disturbing any
    other doc's prefix sum."""
    import time as _time

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        budgeted_ingest_run,
    )

    rows = [
        (1, "srcA", "alpha beta gamma"),
        (2, "srcA", None),
        (3, "srcA", "delta epsilon"),
        (4, "srcB", "zeta"),
    ]
    feed = str(tmp_path / "nq_feed")
    os.makedirs(feed)
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(feed, "f0")
    )
    now = _time.time()
    for part in os.listdir(os.path.join(feed, "f0")):
        os.utime(os.path.join(feed, "f0", part), (now, now))

    work = str(tmp_path / "nq_work")
    kept_dir = budgeted_ingest_run(
        spark, feed, work, {"srcA": 100, "srcB": 100}
    )
    kept = {r["doc_id"] for r in spark.read.parquet(kept_dir).collect()}
    quar = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(work, "quarantine")
        ).collect()
    }
    assert kept == {1, 3, 4}  # the NULL row blocks nobody behind it
    assert quar == {2}


def test_web_funnel_histogram_mode_bounded_ledger(
    spark, sf_dir, tmp_path
):
    """quantile_mode='histogram': the bounded-state cutoff form - the
    ledger holds additive per-(source, bucket) counts (never a
    per-doc row), the stream equals a sequential fold of the same
    histogram semantics, and the funnel still only narrows."""
    import time as _time

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        quality_score,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        web_funnel_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    n = docs.count()
    files = [
        docs.where(F.col("doc_id") < n // 2),
        docs.where(F.col("doc_id") >= n // 2),
    ]
    feed = str(tmp_path / "wfh_feed")
    os.makedirs(feed)
    now = _time.time()
    for i, frame in enumerate(files):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    work = str(tmp_path / "wfh_work")
    funnel_dir = web_funnel_ingest_run(
        spark, feed, work, quantile_mode="histogram"
    )
    stream_rows = {
        (r.batch_id, r.stage_idx): r.n_docs
        for r in spark.read.parquet(funnel_dir).collect()
    }

    # ledger is count rows, never per-doc
    ledger = spark.read.parquet(os.path.join(work, "scores"))
    assert set(ledger.columns) >= {"source", "bucket", "n"}
    n_sources = docs.select("source").distinct().count()
    assert ledger.count() <= 2 * n_sources * 100

    # fold twin for stage 2 only (stages 1/3 are pinned by the exact-
    # mode test; here the HISTOGRAM cutoff semantics is the new part)
    hist: dict = {}
    for bid, frame in enumerate(files):
        d1 = frame.where(~F.col("source").isin("src2", "src3"))
        scored = d1.select(
            "source",
            F.round(quality_score(F.col("text")), 6).alias("score"),
        ).collect()
        cur: dict = {}
        for r in scored:
            b = min(int(r["score"] * 100), 99)
            cur[(r["source"], b)] = cur.get((r["source"], b), 0) + 1
        merged: dict = dict(hist)
        for k, v in cur.items():
            merged[k] = merged.get(k, 0) + v
        cuts: dict = {}
        for src in {k[0] for k in merged}:
            bks = {b: c for (s, b), c in merged.items() if s == src}
            total = sum(bks.values())
            running = 0
            for b in sorted(bks):
                running += bks[b]
                if running >= 0.25 * total:
                    cuts[src] = b / 100
                    break
        n2 = sum(
            1 for r in scored if r["score"] >= cuts[r["source"]]
        )
        assert stream_rows[(bid, 2)] == n2, (bid, stream_rows[(bid, 2)], n2)
        hist = merged
    # funnel monotone per batch
    for bid in {k[0] for k in stream_rows}:
        seq = [stream_rows[(bid, i)] for i in range(4)]
        assert seq == sorted(seq, reverse=True)


def test_web_funnel_mode_switch_raises_loudly(spark, sf_dir, tmp_path):
    """r10 review wave 4: resuming a funnel work_dir in the other
    quantile mode would misread the score ledger deep inside
    foreachBatch - the mode marker must fail loudly at startup."""
    import time as _time

    import pytest

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        web_funnel_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).limit(40)
    feed = str(tmp_path / "ms_feed")
    os.makedirs(feed)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(feed, "f0")
    )
    now = _time.time()
    for part in os.listdir(os.path.join(feed, "f0")):
        os.utime(os.path.join(feed, "f0", part), (now, now))
    work = str(tmp_path / "ms_work")
    web_funnel_ingest_run(spark, feed, work, quantile_mode="histogram")
    with pytest.raises(ValueError, match="quantile_mode"):
        web_funnel_ingest_run(spark, feed, work)  # defaults to exact


def test_decontam_gate_stream_equals_batch_and_replay_noop(
    spark, sf_dir, tmp_path
):
    """decontam_gate_ingest_run: the streaming exact-substring gate
    must quarantine exactly the docs the batch exact-decontamination
    measurement flags (max verbatim eval run >= 8 tokens), keep the
    rest, conserve the feed (kept + quarantine == input, nothing
    silently dropped), and rewrite - not double-append - on replay."""
    import hashlib

    from txf_continuous_data_pipeline_spark.operators.dedup import (
        suffix_eval_overlap,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        decontam_gate_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents")
    train = docs.select("doc_id", "source", "text").where(
        F.col("source") != "src0"
    )
    ev = docs.where(F.col("source") == "src0").localCheckpoint(
        eager=True
    )
    feed = str(tmp_path / "feed")
    for i in range(3):
        train.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
    work = str(tmp_path / "work")
    kept_dir, quar_dir = decontam_gate_ingest_run(
        spark, feed, work, ev, max_run=8
    )

    kept = spark.read.parquet(kept_dir)
    quar = spark.read.parquet(quar_dir)
    all_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    quar_ids = {r["doc_id"] for r in quar.collect()}
    assert kept_ids | quar_ids == all_ids
    assert not (kept_ids & quar_ids)

    # batch fold: the same operator over the WHOLE train side
    lens = suffix_eval_overlap(train, ev)
    flags = {
        r["doc_id"]: r["mx"]
        for r in lens.groupBy("doc_id")
        .agg(F.max("eval_len").alias("mx"))
        .collect()
    }
    want_quar = {d for d, m in flags.items() if m >= 8}
    assert quar_ids == want_quar and want_quar
    # quarantined rows carry the offending run length for audit
    for r in quar.collect():
        assert r["max_eval_run"] == flags[r["doc_id"]] >= 8

    # ledger conserves the feed per batch
    led = spark.read.parquet(os.path.join(work, "ledger"))
    tot = led.agg(
        F.sum("n_in").alias("i"),
        F.sum("n_kept").alias("k"),
        F.sum("n_quarantined").alias("q"),
    ).collect()[0]
    assert tot["i"] == len(all_ids) and tot["k"] + tot["q"] == tot["i"]

    # replay over the consumed checkpoint rewrites identical bytes
    def _tree(path):
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, path)] = hashlib.sha256(
                        fh.read()
                    ).hexdigest()
        return out

    before_k, before_q = _tree(kept_dir), _tree(quar_dir)
    decontam_gate_ingest_run(spark, feed, work, ev, max_run=8)
    assert _tree(kept_dir) == before_k
    assert _tree(quar_dir) == before_q
