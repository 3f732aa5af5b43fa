"""Invariants for the training-set composition operators
(pack_sequences, mixture_sample) beyond the DuckDB parity check in
test_oracle_parity: structural properties a packed corpus must hold
regardless of data, and determinism under re-partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    mixture_sample,
    pack_sequences,
)
from txf_continuous_data_pipeline_spark.sources import read_table

SEQ = 64


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_pack_offsets_within_sequence(spark, sf_dir):
    out = pack_sequences(_docs(spark, sf_dir), seq_tokens=SEQ)
    bad = out.where(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= SEQ)
    ).count()
    assert bad == 0


def test_pack_stream_is_gapless_per_shard(spark, sf_dir):
    # Reconstruct each doc's start position (seq_index*SEQ + seq_offset):
    # within a shard, start positions must be exactly the running sum of
    # preceding token counts - no gaps, no overlaps.
    out = pack_sequences(_docs(spark, sf_dir), seq_tokens=SEQ)
    rows = out.orderBy("source", "doc_id").collect()
    pos = {}
    for r in rows:
        expect = pos.get(r["source"], 0)
        assert r["seq_index"] * SEQ + r["seq_offset"] == expect
        pos[r["source"]] = expect + r["n_tokens"]


def test_pack_spans_boundary_flag(spark, sf_dir):
    out = pack_sequences(_docs(spark, sf_dir), seq_tokens=SEQ)
    bad = out.where(
        F.col("spans_boundary")
        != (
            F.floor((F.col("seq_index") * SEQ + F.col("seq_offset")
                     + F.col("n_tokens") - 1) / SEQ)
            > F.col("seq_index")
        )
    ).count()
    assert bad == 0


def _mix(spark, sf_dir, df=None):
    docs = df if df is not None else _docs(spark, sf_dir)
    weight = F.when(
        F.substring(F.col("source"), 4, 10).cast("int") < 5, F.lit(2.0)
    ).otherwise(F.lit(1.0))
    return mixture_sample(docs, weight=weight, budget_tokens=1200)


def test_mixture_deterministic_under_repartition(spark, sf_dir):
    a = sorted(r["doc_id"] for r in _mix(spark, sf_dir).collect())
    b = sorted(
        r["doc_id"]
        for r in _mix(
            spark, sf_dir, _docs(spark, sf_dir).repartition(7)
        ).collect()
    )
    assert a == b and len(a) > 0


def test_mixture_upweighted_sources_get_higher_rate(spark, sf_dir):
    rates = {
        r["source"]: r["keep_rate"]
        for r in _mix(spark, sf_dir).select("source", "keep_rate")
        .distinct().collect()
    }
    up = [v for s, v in rates.items() if int(s[3:]) < 5]
    down = [v for s, v in rates.items() if int(s[3:]) >= 5]
    if up and down:
        assert min(up) > max(down) * 1.2  # 2x weight, similar sizes


def test_chunk_documents_reconstruction(spark):
    """Chunking invariants: stride reconstruction (dropping each
    chunk's first `overlap` tokens after chunk 0 and concatenating
    reproduces the token stream exactly), size bounds, and the
    single-chunk short-doc case."""
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        chunk_documents,
    )

    rows = [
        (0, " ".join(f"t{i}" for i in range(200))),  # multi-chunk
        (1, " ".join(f"s{i}" for i in range(64))),  # exactly one chunk
        (2, "short doc"),  # far below one chunk
        (3, " ".join(f"u{i}" for i in range(65))),  # one past the edge
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=64, overlap=16)
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text.split(" "), r.n_tokens)
        for r in out.collect()
    }
    for doc_id, text in rows:
        toks = text.lower().split()
        chunks = sorted(
            (cid, v) for (d, cid), v in got.items() if d == doc_id
        )
        # reconstruction
        rebuilt = list(chunks[0][1][0])
        for _, (ctoks, _n) in chunks[1:]:
            rebuilt.extend(ctoks[16:])
        assert rebuilt == toks, doc_id
        # bounds: every chunk <= 64 tokens, all but the last full
        for _, (ctoks, n) in chunks[:-1]:
            assert len(ctoks) == 64 and n == 64
        assert len(chunks[-1][1][0]) <= 64
        # consecutive overlap is literal
        for (_, (a, _)), (_, (b, _)) in zip(chunks, chunks[1:]):
            assert a[48:] == b[: len(a[48:])]
    assert max(cid for (_, cid) in got) >= 3  # doc 0 really multi-chunk
    assert sum(1 for (d, _) in got if d == 1) == 1
    assert sum(1 for (d, _) in got if d == 2) == 1
    assert sum(1 for (d, _) in got if d == 3) == 2


from hypothesis import given, settings
from hypothesis import strategies as st

_tok = st.sampled_from(["a", "bb", "ccc", "dd", "e"])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.lists(_tok, min_size=1, max_size=150), min_size=1, max_size=4),
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=0, max_value=10),
)
def test_chunking_reconstruction_property(spark, docs, chunk, overlap):
    """Property: for ANY doc lengths and any 0 <= overlap < chunk, the
    stride reconstruction reproduces the exact token stream and every
    chunk respects the size bound."""
    if overlap >= chunk:
        overlap = chunk - 1
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        chunk_documents,
    )

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, d in enumerate(docs):
        chunks = [t for _, t in sorted(got[i])]
        rebuilt = chunks[0].split(" ")
        for c in chunks[1:]:
            rebuilt.extend(c.split(" ")[overlap:])
        assert rebuilt == d, (i, chunk, overlap)
        assert all(len(c.split(" ")) <= chunk for c in chunks)


def test_bpe_train_matches_pure_python(spark):
    """Differential: the distributed vocab-weighted BPE trainer must
    produce the exact merge sequence (pairs, counts, order) of a
    pure-Python reference with the same tie-break (count desc, pair
    lexicographic)."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        bpe_train,
    )

    texts = [
        "low low low lower lowest newest newest",
        "widest newest low wider new news",
        "lowest wide wide wide newer",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = bpe_train(df, n_merges=8)

    # pure-Python reference on the same normalized token stream
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for tok in t.lower().strip().split():
            vocab[tok] += 1
    seqs = {tok: list(tok) for tok in vocab}
    want = []
    for step in range(8):
        pairs = Counter()
        for tok, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[tok]
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        want.append((step, a, b, a + b, n))
        for tok, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[tok] = out
    assert got == want, (got, want)


def test_bpe_train_ignores_empty_documents(spark):
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        bpe_train,
    )

    df = spark.createDataFrame(
        [("low low lower",), ("",), ("   ",)], ["text"]
    )
    got = bpe_train(df, n_merges=2)
    assert got and got[0][1:4] == ("l", "o", "lo")


def test_bpe_encode_counts_matches_pure_python(spark):
    """Differential: the distributed encoder's per-doc BPE token counts
    must equal a pure-Python end-to-end encode (train on the corpus,
    replay merges per word), and obey the structural properties:
    zero merges -> symbol count = character count, and every applied
    merge can only SHRINK a document's token count."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        bpe_apply_merges,
        bpe_encode_counts,
        bpe_train,
    )

    texts = [
        "low low low lower lowest newest newest",
        "widest newest low wider new news",
        "lowest wide wide wide newer",
        "",
        "   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe_train(df, n_merges=8)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(df, merges).collect()
    }

    rules = [(l, r) for _, l, r, _m, _n in merges]
    for i, t in enumerate(texts):
        words = [w for w in t.strip().lower().split() if w]
        want = sum(len(bpe_apply_merges(list(w), rules)) for w in words)
        assert got[i] == (len(words), want), (i, got[i], (len(words), want))
        # merges never grow the count; no merges = character count
        chars = sum(len(w) for w in words)
        assert got[i][1] <= chars
    # zero-rule encode degenerates to character counting
    got0 = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_counts(df, []).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.strip().lower().split() if w]
        assert got0[i] == sum(len(w) for w in words)


def test_bpe_encode_compresses_on_testdata(spark, sf_dir):
    # End-to-end on the documents table: trained merges must strictly
    # reduce total token count vs the unmerged character stream, and
    # never fall below the word count (a symbol spans >= 1 char).
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        bpe_encode_counts,
        bpe_train,
    )
    from txf_continuous_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=10)
    assert len(merges) == 10
    counts = bpe_encode_counts(docs, merges)
    bad = counts.where(F.col("n_bpe_tokens") < F.col("n_words")).count()
    assert bad == 0
    tot = counts.agg(
        F.sum("n_bpe_tokens").alias("bpe"), F.sum("n_words").alias("w")
    ).collect()[0]
    chars = bpe_encode_counts(docs, []).agg(
        F.sum("n_bpe_tokens").alias("c")
    ).collect()[0]["c"]
    assert tot["bpe"] < chars, (tot["bpe"], chars)


def test_grouped_split_keeps_duplicates_together(spark):
    """Leakage guard: rows sharing a group key always share a split,
    and the banding matches split_assign's when the group key IS the
    id (same md5 band math)."""
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        grouped_split_assign,
        split_assign,
    )

    rows = [(i, f"doc text {i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "g", F.md5("text")
    )
    out = grouped_split_assign(df, group_col="g")
    # every group maps to exactly one split
    n_bad = (
        out.groupBy("g")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert n_bad == 0
    # degenerate group key = id reproduces split_assign exactly
    ids = spark.createDataFrame(
        [(i,) for i in range(1000)], ["doc_id"]
    )
    a = {
        r["doc_id"]: r["split"]
        for r in split_assign(ids, id_col="doc_id").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in grouped_split_assign(
            ids, group_col=F.col("doc_id")
        ).collect()
    }
    assert a == b
    # all three splits are populated at the GROUP level on 1000 ids
    assert set(a.values()) == {"train", "val", "test"}


def test_bpe_train_driver_and_distributed_paths_agree(spark):
    """The driver fast path (incremental local pair counts) and the
    distributed merge loop must produce the IDENTICAL merge sequence,
    including counts and tie-breaks."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        bpe_train,
    )

    texts = [
        "low low low lower lowest newest newest",
        "widest newest low wider new news",
        "lowest wide wide wide newer",
        "aaa aaaa aa a abab abba",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    driver = bpe_train(df, n_merges=8)
    distributed = bpe_train(df, n_merges=8, driver_vocab_limit=0)
    assert driver == distributed, (driver, distributed)


def _py_byte_bpe_reference(texts, n_merges):
    """Independent pure-Python byte-level BPE: Python re pretokenizer,
    UTF-8 bytes as hex-pair symbols, naive full recount per step, its
    own left-to-right merge fold (no operator code reused)."""
    import re
    from collections import Counter

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        BYTE_BPE_PRETOKEN_RE,
    )

    pat = re.compile(BYTE_BPE_PRETOKEN_RE)
    vocab = Counter()
    for t in texts:
        vocab.update(pat.findall(t))
    seqs = {}
    for tok in vocab:
        hx = tok.encode("utf-8").hex().upper()
        seqs[tok] = [hx[i : i + 2] for i in range(0, len(hx), 2)]
    merges = []
    for step in range(n_merges):
        pairs = Counter()
        for tok, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[tok]
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((step, a, b, a + b, n))
        for tok, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[tok] = out
    return merges, vocab, seqs


def test_byte_bpe_train_matches_pure_python(spark):
    """Differential: byte-level BPE with regex pre-tokenization must
    produce the exact merge sequence of an independent pure-Python
    byte-level reference - including multi-byte UTF-8, contraction
    pretokens, leading-space word pretokens, and punctuation runs."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        byte_bpe_train,
    )

    texts = [
        "low low low, lower lowest... it's the newest!",
        "don't stop - the widest newest low wider new news",
        "Pommes frites für alle: füür!! 12 34 512 cafe café",
        "   spaced    out\t\ttabs\nand newlines   ",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = byte_bpe_train(df, n_merges=12)
    want, _, _ = _py_byte_bpe_reference(texts, 12)
    assert got == want, (got, want)


def test_byte_bpe_train_paths_agree(spark):
    """Driver-local incremental path == distributed fold path on the
    byte alphabet (the vocab-amortization must survive the alphabet
    change)."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        byte_bpe_train,
    )

    texts = [
        "it's low low low, lower! 42 42 042",
        "the CAFÉ's café -- so wide, so new",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    local = byte_bpe_train(df, n_merges=6)
    dist = byte_bpe_train(df, n_merges=6, driver_vocab_limit=0)
    assert local == dist and local, (local, dist)


def test_byte_bpe_encode_counts_matches_pure_python(spark):
    """Encode differential: per-doc pretoken + BPE token counts under
    the trained rules must equal the reference's replay; every string
    is representable (no unk), so byte totals reconcile."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        byte_bpe_encode_counts,
        byte_bpe_train,
    )
    import re
    from collections import Counter

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        BYTE_BPE_PRETOKEN_RE,
    )

    texts = [
        "low low low, lower lowest... it's the newest!",
        "don't stop - the widest newest low wider new news",
        "café füür!! 12 34 512",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = byte_bpe_train(df, n_merges=8)
    got = {
        r["doc_id"]: (r["n_pretokens"], r["n_bpe_tokens"])
        for r in byte_bpe_encode_counts(df, merges).collect()
    }

    _, _, seqs = _py_byte_bpe_reference(texts, 8)
    pat = re.compile(BYTE_BPE_PRETOKEN_RE)
    want = {}
    for i, t in enumerate(texts):
        toks = pat.findall(t)
        want[i] = (len(toks), sum(len(seqs[tok]) for tok in toks))
    assert got == want, (got, want)


def test_training_shards_partition_balance_and_determinism(
    spark, sf_dir, tmp_path
):
    """write_training_shards: every doc lands in exactly one shard=N
    directory with ONE data file per shard (the data-loader contract);
    shard char-mass is balanced (every shard within 2x of the mean -
    far tighter than a doc-count-only deal on skewed sizes would
    need); and a re-run reproduces the identical assignment (no rand
    anywhere)."""
    import os

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        shard_assign,
        write_training_shards,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    n_shards = 8
    out = str(tmp_path / "shards")
    manifest = {
        r["shard"]: (r["n_docs"], r["total_size"])
        for r in write_training_shards(
            docs, out, n_shards=n_shards
        ).collect()
    }
    assert set(manifest) == set(range(n_shards))
    # exactly-once coverage, read back from the written layout
    back = spark.read.parquet(out)
    ids = [r["doc_id"] for r in back.select("doc_id").collect()]
    assert sorted(ids) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # one data file per shard directory
    for s in range(n_shards):
        d = os.path.join(out, f"shard={s}")
        parts = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(parts) == 1, (s, parts)
    # size balance: greedy round-robin over descending sizes
    sizes = [v[1] for v in manifest.values()]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 2 * mean and min(sizes) >= mean / 2, manifest
    # manifest totals agree with the written bytes' own aggregation
    again = {
        (r["shard"], r["n"], r["tot"])
        for r in back.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("tot"),
        )
        .collect()
    }
    assert again == {
        (s, n, t) for s, (n, t) in manifest.items()
    }
    # determinism: a second assignment is row-identical
    a = shard_assign(docs, n_shards=n_shards).select("doc_id", "shard")
    b = shard_assign(docs, n_shards=n_shards).select("doc_id", "shard")
    assert {tuple(r) for r in a.collect()} == {
        tuple(r) for r in b.collect()
    }


def test_temperature_mixture_rebalances_toward_small_strata(spark, sf_dir):
    """alpha < 1 must give smaller strata HIGHER keep-rates (rate is
    monotone non-increasing in stratum token mass for alpha < 1), and
    alpha = 1.0 must collapse to natural proportions - one shared rate
    wherever the budget binds."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        temperature_mixture_sample,
    )

    docs = _docs(spark, sf_dir)
    out = temperature_mixture_sample(docs, alpha=0.5, budget_tokens=1200)
    sized = {
        r["source"]: (r["toks"], r["rate"])
        for r in out.groupBy("source")
        .agg(
            F.sum("n_tokens").alias("_kept"),
            F.max("keep_rate").alias("rate"),
        )
        .join(
            docs.groupBy("source").agg(
                F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("toks")
            ),
            "source",
        )
        .select("source", "toks", "rate")
        .collect()
    }
    pairs = sorted(sized.values())
    for (t1, r1), (t2, r2) in zip(pairs, pairs[1:]):
        if t1 < t2:
            assert r1 >= r2 - 1e-9, (t1, r1, t2, r2)
    nat = temperature_mixture_sample(docs, alpha=1.0, budget_tokens=1200)
    rates = {
        r["keep_rate"]
        for r in nat.select("keep_rate").distinct().collect()
        if r["keep_rate"] < 1.0
    }
    assert len(rates) <= 1, rates  # natural proportions: one binding rate


def test_temperature_mixture_deterministic_under_repartition(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        temperature_mixture_sample,
    )

    docs = _docs(spark, sf_dir)
    a = sorted(
        r["doc_id"]
        for r in temperature_mixture_sample(
            docs, alpha=0.5, budget_tokens=1200
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in temperature_mixture_sample(
            docs.repartition(7), alpha=0.5, budget_tokens=1200
        ).collect()
    )
    assert a == b and len(a) > 0


def test_byte_pretoken_re2_twin_matches_lookahead_on_corpus():
    """r11 verdict #3: the DuckDB oracle pretokenizes with the
    RE2-safe BYTE_BPE_PRETOKEN_RE2 (\\s+$ anchored arm in place of the
    lookahead \\s+(?!\\S) RE2 cannot express). Pin, per document over
    EVERY locally staged corpus (all SFs), that DuckDB's RE2 extract
    of the twin equals Python re's extract of the lookahead form - the
    corpus-exactness claim the oracle pairing rests on. Also pin the
    KNOWN divergence class as a tripwire: a multi-space run before
    non-whitespace is where the forms differ, so if the driver ever
    regenerates documents with such runs, this test (not a hash
    mismatch) names the constant to fix."""
    import glob
    import re as _re

    import duckdb

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        BYTE_BPE_PRETOKEN_RE,
        BYTE_BPE_PRETOKEN_RE2,
    )

    look = _re.compile(BYTE_BPE_PRETOKEN_RE)
    con = duckdb.connect()
    checked = 0
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        rows = con.execute(
            "SELECT doc_id, text, regexp_extract_all(text, ?) "
            f"FROM read_parquet('{path}')",
            [BYTE_BPE_PRETOKEN_RE2],
        ).fetchall()
        for doc_id, text, re2_toks in rows:
            assert look.findall(text or "") == re2_toks, (path, doc_id)
            checked += 1
    assert checked >= 500

    # hand cases where the forms agree (contractions, punct, digits,
    # space-absorbed apostrophes, trailing whitespace)
    agree = [
        "hello world", "it's Bob's 42nd try!", "x '", "don't",
        "3.14 costs $5", "ABC'll go", "tail   ", "one\n", "",
        "café price", "a 'street sign",
    ]
    for s in agree:
        got = con.execute(
            "SELECT regexp_extract_all(?, ?)",
            [s, BYTE_BPE_PRETOKEN_RE2],
        ).fetchone()[0]
        assert got == look.findall(s), s

    # the documented divergence class: multi-whitespace before
    # non-whitespace (the lookahead donates the run's last space to
    # the next pretoken; the twin keeps the run whole)
    s = "a  b"
    got = con.execute(
        "SELECT regexp_extract_all(?, ?)", [s, BYTE_BPE_PRETOKEN_RE2]
    ).fetchone()[0]
    assert look.findall(s) == ["a", " ", " b"]
    assert got == ["a", "  ", "b"] and got != look.findall(s)
