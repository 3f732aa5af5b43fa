"""JSONL shard sink/source: byte reproducibility, idempotent rewrite,
and the quarantine-not-crash contract for malformed lines."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl,
)


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"lang{i % 2}", f"text body {i}") for i in range(40)],
        "doc_id long, lang string, text string",
    )


def _shard_bytes(path):
    return {
        os.path.basename(p): open(p, "rb").read()
        for p in sorted(glob.glob(os.path.join(path, "shard-*.jsonl")))
    }


def test_jsonl_write_is_reproducible_and_idempotent(spark, tmp_path):
    p = str(tmp_path / "a")
    write_jsonl(_docs(spark), p, n_shards=4, key_col="doc_id")
    first = _shard_bytes(p)
    assert len(first) == 4
    # rewrite into the same dir: byte-identical (atomic replace)
    write_jsonl(_docs(spark), p, n_shards=4, key_col="doc_id")
    assert _shard_bytes(p) == first
    # and a second dir gets the same bytes (content-addressable)
    p2 = str(tmp_path / "b")
    write_jsonl(_docs(spark), p2, n_shards=4, key_col="doc_id")
    assert {k: v for k, v in _shard_bytes(p2).items()} == first
    # no leftover tmp files
    assert not glob.glob(os.path.join(p, ".shard-*"))


def test_jsonl_roundtrip_is_lossless(spark, tmp_path):
    p = str(tmp_path / "rt")
    write_jsonl(_docs(spark), p, n_shards=4, key_col="doc_id")
    back = read_jsonl(
        spark, p, "doc_id long, lang string, text string"
    )
    got = {
        r["doc_id"]: (r["lang"], r["text"], r["bad_record"])
        for r in back.collect()
    }
    want = {
        r["doc_id"]: (r["lang"], r["text"], None)
        for r in _docs(spark).collect()
    }
    assert got == want


def test_jsonl_malformed_line_is_quarantined_not_fatal(spark, tmp_path):
    p = str(tmp_path / "q")
    write_jsonl(_docs(spark), p, n_shards=2, key_col="doc_id")
    victim = sorted(glob.glob(os.path.join(p, "shard-*.jsonl")))[0]
    with open(victim, "ab") as f:
        f.write(b'{"doc_id": 999, "lang": truncated-garbage\n')
    back = read_jsonl(
        spark, p, "doc_id long, lang string, text string"
    )
    # Spark rejects corrupt-column-only queries off a raw json scan
    # (see read_jsonl docstring); reference data columns alongside it.
    rows = back.select("doc_id", "text", "bad_record").collect()
    bad = [r for r in rows if r["bad_record"] is not None]
    assert len(bad) == 1
    assert "truncated-garbage" in bad[0]["bad_record"]
    # every clean row still reads exactly
    clean = [r for r in rows if r["bad_record"] is None]
    assert len(clean) == 40
    assert all(r["text"] is not None for r in clean)


def test_jsonl_explicit_shard_col_controls_layout(spark, tmp_path):
    p = str(tmp_path / "s")
    docs = _docs(spark).withColumn("shard", F.col("doc_id") % 3)
    write_jsonl(docs, p, n_shards=3, key_col="doc_id", shard_col="shard")
    names = sorted(
        os.path.basename(x)
        for x in glob.glob(os.path.join(p, "shard-*.jsonl"))
    )
    assert names == [
        "shard-00000.jsonl", "shard-00001.jsonl", "shard-00002.jsonl"
    ]
    # shard membership is exactly doc_id % 3, and the shard col does
    # not leak into the records
    import json

    for i, n in enumerate(names):
        for line in open(os.path.join(p, n)):
            rec = json.loads(line)
            assert rec["doc_id"] % 3 == i
            assert set(rec) == {"doc_id", "lang", "text"}


def test_jsonl_rewrite_removes_stale_shards_and_layout_is_fixed(
    spark, tmp_path
):
    """Full-overwrite semantics: after any write the directory holds
    exactly shard-0..n-1; a narrower rewrite cannot leave stale
    records for read_jsonl to silently mix in, and a shard no row
    hashes to still gets an (empty) file."""
    p = str(tmp_path / "ow")
    write_jsonl(_docs(spark), p, n_shards=8, key_col="doc_id")
    assert len(_shard_bytes(p)) == 8
    # rewrite with fewer shards AND a filtered frame: stale shards
    # 3..7 must be gone, and the read returns ONLY the new records
    few = _docs(spark).where(F.col("doc_id") < 3).withColumn(
        "shard", F.lit(0)
    )
    write_jsonl(few, p, n_shards=3, key_col="doc_id", shard_col="shard")
    names = sorted(_shard_bytes(p))
    assert names == [
        "shard-00000.jsonl", "shard-00001.jsonl", "shard-00002.jsonl"
    ]
    # shards 1 and 2 exist but are empty (no row hashed to them)
    sizes = {k: len(v) for k, v in _shard_bytes(p).items()}
    assert sizes["shard-00001.jsonl"] == 0
    assert sizes["shard-00002.jsonl"] == 0
    back = read_jsonl(
        spark, p, "doc_id long, lang string, text string"
    )
    rows = back.select("doc_id", "bad_record").collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2]
    assert all(r["bad_record"] is None for r in rows)
