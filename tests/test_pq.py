"""Product-quantization operator tests: trainer differential vs a
single-node numpy PQ with the identical deterministic init, ADC recall
vs exact distances, and the seeded-codebook invariants the oracle SQL
relies on."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)
from txf_continuous_data_pipeline_spark.sources import read_table

M, K = 8, 16


def _load(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


def _np_pq_train(X, ids, m, k, max_iter, tol=1e-6):
    """Single-node reference: same md5-seeded init, same squared-L2
    lower-index-tie assignment, same keep-empty-cluster rule."""
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(str(int(ids[i])).encode()).hexdigest(),
            int(ids[i]),
        ),
    )
    C = X[order[:k]].copy()
    d_sub = X.shape[1] // m
    for _ in range(max_iter):
        Xs = X.reshape(len(X), m, d_sub)
        Cs = C.reshape(k, m, d_sub)
        nxt = C.copy()
        for s in range(m):
            D = ((Xs[:, s, None, :] - Cs[None, :, s, :]) ** 2).sum(-1)
            codes_s = D.argmin(1)
            for c in range(k):
                mask = codes_s == c
                if mask.any():
                    nxt[c, s * d_sub : (s + 1) * d_sub] = Xs[mask, s].mean(0)
        shift = ((C - nxt) ** 2).reshape(k, m, d_sub).sum(2).max()
        C = nxt
        if shift <= tol:
            break
    return C


def test_pq_train_matches_numpy_reference(spark, sf_dir):
    ids, X = _load(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    cb, n_iter, _ = pq_train(emb, m=M, k=K, max_iter=3)
    got = np.array([v for _, v in sorted(cb)])
    want = _np_pq_train(X, ids, M, K, max_iter=3)
    assert got.shape == want.shape == (K, X.shape[1])
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_pq_seeds_encode_to_themselves(spark, sf_dir):
    # codeword j is vec_id j's subvector, so every seed's nearest
    # codeword in every subspace is itself (distance 0, tie-broken low)
    emb = read_table(spark, sf_dir, "embeddings")
    seeds = emb.where(F.col("vec_id") < K)
    cb = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in seeds.select("vec_id", "embedding").collect()
    ]
    rows = pq_encode(seeds, cb, m=M).select("vec_id", "codes").collect()
    for r in rows:
        assert all(c == r["vec_id"] for c in r["codes"]), (
            r["vec_id"],
            r["codes"],
        )


def test_pq_codes_in_range(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    cb = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < K)
        .select("vec_id", "embedding")
        .collect()
    ]
    bad = (
        pq_encode(emb, cb, m=M)
        .select(F.explode("codes").alias("c"))
        .where((F.col("c") < 0) | (F.col("c") >= K))
        .count()
    )
    assert bad == 0


def test_pq_adc_shortlist_recall_vs_exact(spark, sf_dir):
    """The production PQ contract is shortlist-then-rescore: ADC ranks
    a candidate shortlist from codes alone, exact distances rescore
    only the shortlist. Check: the top-100 ADC shortlist (~20% of the
    495-vector corpus) from a LEARNED codebook recovers >= 60% of the
    exact squared-L2 top-10 per query. The threshold is measured
    reality on this corpus (0.44/0.60/0.74 mean recall@25/50/100):
    the testdata embeddings are near-random 64-dim unit vectors -
    PQ's worst case, no cluster structure to exploit - so real
    clustered corpora only do better."""
    ids, X = _load(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    cb, _, _ = pq_train(emb, m=M, k=K, max_iter=3)

    n_q = 5
    corpus_mask = ids >= n_q
    corpus_ids = ids[corpus_mask]
    codes = pq_encode(
        emb.where(F.col("vec_id") >= n_q), cb, m=M
    ).select("vec_id", "codes")
    queries = [(int(ids[i]), list(X[i])) for i in range(n_q)]
    got = pq_adc_topk(codes, queries, cb, m=M, k_top=100).collect()

    recalls = []
    for qi in range(n_q):
        shortlist = {
            r["vec_id"] for r in got if r["q_id"] == ids[qi]
        }
        d = ((X[corpus_mask] - X[qi][None, :]) ** 2).sum(1)
        exact = set(corpus_ids[np.argsort(d, kind="stable")[:10]])
        recalls.append(len(exact & shortlist) / 10)
    assert sum(recalls) / n_q >= 0.6, recalls


def test_pq_adc_exact_on_reconstruction(spark, sf_dir):
    """Sanity anchor: when every corpus vector IS a codeword
    reconstruction, ADC distance equals the true distance exactly -
    the LUT gather carries no approximation of its own."""
    emb = read_table(spark, sf_dir, "embeddings")
    cb = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < K)
        .select("vec_id", "embedding")
        .collect()
    ]
    seeds = emb.where(F.col("vec_id") < K)
    codes = pq_encode(seeds, cb, m=M).select("vec_id", "codes")
    C = np.array([v for _, v in sorted(cb)])
    queries = [(1000, list(C[3]))]
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_topk(codes, queries, cb, m=M, k_top=K).collect()
    }
    for j in range(K):
        want = round(float(((C[j] - C[3]) ** 2).sum()), 6)
        assert abs(got[j] - want) <= 1e-6, (j, got[j], want)


def test_pq_adc_qtable_matches_closure_form(spark, sf_dir):
    """The query-table ADC (LUTs from an Arrow pass over the query
    DataFrame, JVM-side gather) must reproduce the list-closure ADC
    exactly on the same inputs - same rows, same 6dp distances, same
    ranks."""
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        pq_adc_topk_join,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cb = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < K)
        .select("vec_id", "embedding")
        .collect()
    ]
    is_q = F.col("vec_id") % 50 == 0
    codes = pq_encode(emb.where(~is_q), cb, m=M).select("vec_id", "codes")
    q_list = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(is_q).select("vec_id", "embedding").collect()
    ]
    assert len(q_list) >= 2
    q_df = emb.where(is_q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    want = {
        (r["q_id"], r["rn"]): (r["vec_id"], r["adc_dist"])
        for r in pq_adc_topk(codes, q_list, cb, m=M, k_top=5).collect()
    }
    got = {
        (r["q_id"], r["rn"]): (r["vec_id"], r["adc_dist"])
        for r in pq_adc_topk_join(
            codes, q_df, cb, m=M, k_top=5
        ).collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], (key, got[key], want[key])
        assert abs(got[key][1] - want[key][1]) <= 1e-6, (key, got, want)


def test_ivfpq_index_serving_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted IVFPQ index must (a) serve the identical result as
    the in-memory composition and (b) actually PRUNE: the scan plan
    carries a cluster_id partition filter, and only the probed cells'
    directories are read."""
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )
    from txf_continuous_data_pipeline_spark.queries.similarity import (
        _fixed_centroids,
        _pq_seed_codebook,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = _fixed_centroids()
    cb = _pq_seed_codebook(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") >= 5)
    qraw = emb.where(F.col("vec_id") < 5)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(corpus, cents, cb, path, m=M)

    served = ivfpq_topk_from_index(
        spark, path, qraw, cents, cb, m=M, k=3, nprobe=2, shortlist=20
    )
    want = {
        (r["q_id"], r["rn"]): (r["vec_id"], r["sq_dist"])
        for r in ivfpq_topk(
            emb, cents, cb, m=M, query_pred=lambda c: c < 5, k=3,
            nprobe=2, shortlist=20,
        ).collect()
    }
    got = {
        (r["q_id"], r["rn"]): (r["vec_id"], r["sq_dist"])
        for r in served.collect()
    }
    assert got == want and got

    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan.split(
        "PartitionFilters", 1
    )[1][:200], plan
    # probing every cell reads everything and recovers exact search
    n_corpus = corpus.count()
    full = ivfpq_topk_from_index(
        spark, path, qraw, cents, cb, m=M, k=3, nprobe=len(cents),
        shortlist=n_corpus,
    )
    exact = ivfpq_topk(
        emb, cents, cb, m=M, query_pred=lambda c: c < 5, k=3,
        nprobe=len(cents), shortlist=n_corpus,
    )
    assert {tuple(r) for r in full.collect()} == {
        tuple(r) for r in exact.collect()
    }


def test_append_ivfpq_index_equals_rebuild_and_replays(
    spark, sf_dir, tmp_path
):
    """Incremental index maintenance: base write on 2/3 of the corpus
    + append_ivfpq_index of the rest must serve IDENTICALLY to a
    from-scratch build over the union, replaying the same batch must
    append 0 rows (at-least-once safety), and the stored rows must
    match the rebuild exactly."""
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        append_ivfpq_index,
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )
    from txf_continuous_data_pipeline_spark.queries.similarity import (
        _fixed_centroids,
        _pq_seed_codebook,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = _fixed_centroids()
    cb = _pq_seed_codebook(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") >= 5)
    base = corpus.where(F.col("vec_id") % 3 != 0)
    batch = corpus.where(F.col("vec_id") % 3 == 0)
    qraw = emb.where(F.col("vec_id") < 5)

    inc = str(tmp_path / "inc")
    write_ivfpq_index(base, cents, cb, inc, m=M)
    assert append_ivfpq_index(
        spark, inc, batch, cents, cb, m=M
    ) == batch.count()
    # replayed batch: the touched-cell anti-join must drop every row
    assert append_ivfpq_index(spark, inc, batch, cents, cb, m=M) == 0

    full = str(tmp_path / "full")
    write_ivfpq_index(corpus, cents, cb, full, m=M)

    def stored(path):
        return {
            (r["vec_id"], r["cluster_id"], tuple(r["codes"]))
            for r in spark.read.parquet(path)
            .select("vec_id", "cluster_id", "codes")
            .collect()
        }

    assert stored(inc) == stored(full)

    def serve(path):
        return {
            (r["q_id"], r["rn"]): (r["vec_id"], r["sq_dist"])
            for r in ivfpq_topk_from_index(
                spark, path, qraw, cents, cb, m=M, k=3, nprobe=2,
                shortlist=20,
            ).collect()
        }

    got, want = serve(inc), serve(full)
    assert got == want and got


def test_append_ivfpq_index_creates_missing_sink(spark, sf_dir, tmp_path):
    """First batch into a nonexistent path creates the index (the
    bootstrap case of the incremental loop)."""
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        append_ivfpq_index,
    )
    from txf_continuous_data_pipeline_spark.queries.similarity import (
        _fixed_centroids,
        _pq_seed_codebook,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = _fixed_centroids()
    cb = _pq_seed_codebook(spark, sf_dir)
    batch = emb.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 25))
    path = str(tmp_path / "fresh")
    assert append_ivfpq_index(
        spark, path, batch, cents, cb, m=M
    ) == batch.count()
    assert spark.read.parquet(path).count() == batch.count()


def test_ivfpq_cell_stats_skew_tripwire(spark, tmp_path):
    """ivfpq_index_cell_stats must stay quiet on a balanced index and
    trip the retrain flag on a planted hot cell."""
    import pandas as pd

    from txf_continuous_data_pipeline_spark.operators.similarity import (
        ivfpq_index_cell_stats,
        write_ivfpq_index,
    )

    dim = 64
    cents = [
        (c, [100.0 * c if i == 0 else 0.0 for i in range(dim)])
        for c in range(4)
    ]
    cb = [(0, [0.0] * dim), (1, [1.0] * dim)]

    def frame(counts):
        rows = []
        vid = 0
        for cell, n in enumerate(counts):
            for _ in range(n):
                v = [0.0] * dim
                v[0] = 100.0 * cell + 0.5
                rows.append((vid, v))
                vid += 1
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        )

    balanced = str(tmp_path / "balanced")
    write_ivfpq_index(frame([5, 5, 6, 4]), cents, cb, balanced, m=M)
    st = ivfpq_index_cell_stats(spark, balanced)
    assert not st["retrain"] and st["skew"] < 2.0, st

    hot = str(tmp_path / "hot")
    write_ivfpq_index(frame([40, 2, 2, 2]), cents, cb, hot, m=M)
    st = ivfpq_index_cell_stats(spark, hot)
    assert st["retrain"] and st["skew"] > 3.0, st
    assert st["cell_sizes"][0] == 40 and st["max"] == 40, st


def test_ann_index_ingest_stream_equals_batch_build(
    spark, sf_dir, tmp_path
):
    """Streaming index maintenance: feeding the corpus through
    ann_index_ingest_run (availableNow, one file per micro-batch) must
    leave an index that stores AND serves identically to a from-scratch
    write_ivfpq_index over the same corpus; re-running the stream with
    a fresh checkpoint over the same feed must change nothing (the
    append guard makes redelivered rows no-ops)."""
    import shutil

    from txf_continuous_data_pipeline_spark.operators.similarity import (
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )
    from txf_continuous_data_pipeline_spark.queries.similarity import (
        _fixed_centroids,
        _pq_seed_codebook,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        ann_index_ingest_run,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = _fixed_centroids()
    cb = _pq_seed_codebook(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") >= 5).select("vec_id", "embedding")
    qraw = emb.where(F.col("vec_id") < 5)

    feed = str(tmp_path / "feed")
    for i in range(3):
        corpus.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    work = str(tmp_path / "work")
    idx = ann_index_ingest_run(
        spark, feed, work, cents, cb, m=M, timeout_s=240
    )

    full = str(tmp_path / "full")
    write_ivfpq_index(corpus, cents, cb, full, m=M)

    def stored(path):
        return {
            (r["vec_id"], r["cluster_id"], tuple(r["codes"]))
            for r in spark.read.parquet(path)
            .select("vec_id", "cluster_id", "codes")
            .collect()
        }

    assert stored(idx) == stored(full)

    def serve(path):
        return {
            (r["q_id"], r["rn"]): (r["vec_id"], r["sq_dist"])
            for r in ivfpq_topk_from_index(
                spark, path, qraw, cents, cb, m=M, k=3, nprobe=2,
                shortlist=20,
            ).collect()
        }

    assert serve(idx) == serve(full) and serve(idx)

    # redelivery: same feed, FRESH checkpoint -> every row is already
    # present, the anti-join appends 0, index bytes unchanged
    before = stored(idx)
    shutil.rmtree(str(tmp_path / "work" / "ckpt"))
    ann_index_ingest_run(spark, feed, work, cents, cb, m=M, timeout_s=240)
    assert stored(idx) == before


def _np_opq_train(X, ids, m, k, max_iter, pq_iter, tol=1e-7):
    """Single-node OPQ reference mirroring opq_train exactly: identity
    init, warm-started Lloyd half-steps (pq_train semantics incl. the
    md5 seeding on the first alternation and the 1e-6 shift early
    stop), then the orthogonal-Procrustes rotation update from
    svd(X^T Y)."""
    dim = X.shape[1]
    d_sub = dim // m
    xtx = float((X * X).sum())
    R = np.eye(dim)
    C = None
    trace = []
    for _ in range(max_iter):
        Xr = X @ R
        if C is None:
            order = sorted(
                range(len(ids)),
                key=lambda i: (
                    hashlib.md5(str(int(ids[i])).encode()).hexdigest(),
                    int(ids[i]),
                ),
            )
            C = Xr[order[:k]].copy()
        for _li in range(pq_iter):
            Xs = Xr.reshape(len(X), m, d_sub)
            Cs = C.reshape(k, m, d_sub)
            nxt = C.copy()
            for s in range(m):
                D = ((Xs[:, s, None, :] - Cs[None, :, s, :]) ** 2).sum(-1)
                codes_s = D.argmin(1)
                for c in range(k):
                    mask = codes_s == c
                    if mask.any():
                        nxt[c, s * d_sub : (s + 1) * d_sub] = Xs[
                            mask, s
                        ].mean(0)
            shift = ((C - nxt) ** 2).reshape(k, m, d_sub).sum(2).max()
            C = nxt
            if shift <= 1e-6:
                break
        Xs = (X @ R).reshape(len(X), m, d_sub)
        Cs = C.reshape(k, m, d_sub)
        Y = np.empty((len(X), dim))
        for s in range(m):
            D = ((Xs[:, s, None, :] - Cs[None, :, s, :]) ** 2).sum(-1)
            Y[:, s * d_sub : (s + 1) * d_sub] = Cs[D.argmin(1), s]
        G = X.T @ Y
        yty = float((Y * Y).sum())
        trace.append(xtx - 2.0 * float(np.trace(R.T @ G)) + yty)
        U, _s, Vt = np.linalg.svd(G)
        R = U @ Vt
        if len(trace) > 1 and trace[-2] - trace[-1] <= tol * xtx:
            break
    return R, C, trace


def test_opq_train_matches_numpy_reference(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        opq_train,
    )

    ids, X = _load(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    R, cb, trace = opq_train(emb, m=M, k=K, max_iter=2, pq_iter=2)
    C = np.array([v for _, v in sorted(cb)])
    Rw, Cw, tw = _np_opq_train(X, ids, M, K, max_iter=2, pq_iter=2)
    assert np.allclose(C, Cw, atol=1e-6), np.abs(C - Cw).max()
    assert np.allclose(R, Rw, atol=1e-6), np.abs(R - Rw).max()
    assert np.allclose(trace, tw, rtol=1e-9)


def test_opq_objective_monotone_and_rotation_orthogonal(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        opq_train,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    R, _cb, trace = opq_train(emb, m=M, k=K, max_iter=3, pq_iter=1)
    assert np.allclose(R.T @ R, np.eye(R.shape[0]), atol=1e-9)
    for a, b in zip(trace, trace[1:]):
        assert b <= a + 1e-6 * abs(a), trace


def test_rotate_vectors_preserves_norms(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        rotate_vectors,
    )

    _ids, X = _load(spark, sf_dir)
    rng = np.random.RandomState(7)
    Q, _ = np.linalg.qr(rng.normal(size=(X.shape[1], X.shape[1])))
    emb = read_table(spark, sf_dir, "embeddings")
    rot = rotate_vectors(emb, Q)
    got = (
        rot.select("vec_id", "embedding").collect()
    )
    got.sort(key=lambda r: r["vec_id"])
    Xr = np.array([r["embedding"] for r in got])
    assert np.allclose(
        np.linalg.norm(Xr, axis=1), np.linalg.norm(X, axis=1), atol=1e-9
    )
    assert np.allclose(Xr, X @ Q, atol=1e-12)


def test_ivfpq_index_ingest_stream_equals_rebuild(
    spark, sf_dir, tmp_path
):
    """ivfpq_index_ingest_run: an index maintained ONE MICRO-BATCH AT
    A TIME must hold exactly the rows a from-scratch build over the
    union holds, serve identical top-k, log a monitor row per batch,
    and survive a checkpoint-wiped full replay with zero new rows."""
    import os
    import shutil
    import time as _time

    from txf_continuous_data_pipeline_spark.operators.similarity import (
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )
    from txf_continuous_data_pipeline_spark.queries.similarity import (
        _fixed_centroids,
        _pq_seed_codebook,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        ivfpq_index_ingest_run,
    )

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
        "label",
    )
    cents = _fixed_centroids()
    cb = _pq_seed_codebook(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") >= 5)
    qraw = emb.where(F.col("vec_id") < 5)
    n = emb.count()

    feed = str(tmp_path / "ivfpq_feed")
    os.makedirs(feed)
    now = _time.time()
    files = [
        corpus.where(F.col("vec_id") < n // 3),
        corpus.where(
            (F.col("vec_id") >= n // 3) & (F.col("vec_id") < 2 * n // 3)
        ),
        corpus.where(F.col("vec_id") >= 2 * n // 3),
    ]
    for i, frame in enumerate(files):
        fp = os.path.join(feed, f"f{i}")
        frame.coalesce(1).write.mode("overwrite").parquet(fp)
        for part in os.listdir(fp):
            os.utime(os.path.join(fp, part), (now + i * 10, now + i * 10))

    work = str(tmp_path / "ivfpq_work")
    index_dir, monitor_dir = ivfpq_index_ingest_run(
        spark, feed, work, cents, cb, m=M
    )

    full = str(tmp_path / "full")
    write_ivfpq_index(corpus, cents, cb, full, m=M)

    def stored(path):
        return {
            (r["vec_id"], r["cluster_id"], tuple(r["codes"]))
            for r in spark.read.parquet(path)
            .select("vec_id", "cluster_id", "codes")
            .collect()
        }

    assert stored(index_dir) == stored(full)

    def served(path):
        return sorted(
            map(
                tuple,
                ivfpq_topk_from_index(
                    spark, path, qraw, cents, cb, m=M, k=3, nprobe=2,
                    shortlist=20,
                ).collect(),
            )
        )

    assert served(index_dir) == served(full)

    mon = spark.read.parquet(monitor_dir).collect()
    assert sum(r["n_appended"] for r in mon) == corpus.count()
    assert all(r["skew"] >= 1.0 for r in mon)

    # checkpoint-wiped replay: every batch redelivers; the replay
    # guard must append nothing and the monitor rows must rewrite
    shutil.rmtree(os.path.join(work, "ckpt"))
    ivfpq_index_ingest_run(spark, feed, work, cents, cb, m=M)
    assert stored(index_dir) == stored(full)
    mon2 = spark.read.parquet(monitor_dir).collect()
    assert sum(r["n_appended"] for r in mon2) == 0
