"""WebDataset tar shard source/sink: bit-exact round trip, reproducible
shard bytes, deterministic hash sharding, and corrupt-shard quarantine
(one bad tar must yield a flagged row, never a failed stage)."""

from __future__ import annotations

import hashlib
import os
import tarfile

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)


def _samples(spark, sf_dir, n=60):
    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < n)
        .select(
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias(
                "sample_key"
            ),
            F.encode("text", "UTF-8").alias("txt"),
            F.encode(F.col("lang"), "UTF-8").alias("cls"),
        )
    )
    return docs.select(
        "sample_key",
        F.explode(
            F.map_from_arrays(
                F.array(F.lit("txt"), F.lit("cls")),
                F.array(F.col("txt"), F.col("cls")),
            )
        ).alias("ext", "payload"),
    )


def test_webdataset_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    long_form = _samples(spark, sf_dir)
    path = str(tmp_path / "wds")
    manifest = write_webdataset(
        long_form, path, n_shards=4, key_col="sample_key"
    )
    mrows = {r["shard_id"]: r for r in manifest.collect()}
    # every member accounted for in the manifest
    assert sum(r["n_members"] for r in mrows.values()) == long_form.count()
    for r in mrows.values():
        assert os.path.getsize(r["path"]) == r["shard_bytes"]

    back = read_webdataset(spark, path)
    got = {
        (r["sample_key"], r["ext"]): bytes(r["payload"])
        for r in back.collect()
    }
    want = {
        (r["sample_key"], r["ext"]): bytes(r["payload"])
        for r in long_form.collect()
    }
    assert got == want  # bit-exact, nothing lost, nothing invented
    assert back.where(F.col("error").isNotNull()).count() == 0


def test_webdataset_shards_are_byte_reproducible(spark, sf_dir, tmp_path):
    long_form = _samples(spark, sf_dir, n=40)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    # different upstream row order must not change shard bytes
    write_webdataset(long_form, p1, n_shards=3, key_col="sample_key")
    write_webdataset(
        long_form.orderBy(F.desc("ext"), F.desc("sample_key")),
        p2,
        n_shards=3,
        key_col="sample_key",
    )

    def _hashes(p):
        return {
            f: hashlib.sha256(
                open(os.path.join(p, f), "rb").read()
            ).hexdigest()
            for f in sorted(os.listdir(p))
            if f.endswith(".tar")
        }

    h1, h2 = _hashes(p1), _hashes(p2)
    assert h1 == h2 and len(h1) > 0
    # idempotent re-run: same bytes again over the existing sink
    write_webdataset(long_form, p1, n_shards=3, key_col="sample_key")
    assert _hashes(p1) == h1


def test_webdataset_default_sharding_matches_xxhash(spark, sf_dir, tmp_path):
    long_form = _samples(spark, sf_dir, n=30)
    path = str(tmp_path / "wds")
    write_webdataset(long_form, path, n_shards=4, key_col="sample_key")
    back = read_webdataset(spark, path).withColumn(
        "shard_id",
        F.regexp_extract(F.col("shard_path"), r"shard-(\d+)\.tar", 1).cast(
            "long"
        ),
    )
    # the reader (or any oracle) can recompute the shard from the key
    bad = back.where(
        F.pmod(F.xxhash64("sample_key"), F.lit(4)) != F.col("shard_id")
    )
    assert bad.count() == 0


def test_webdataset_corrupt_shard_quarantined(spark, sf_dir, tmp_path):
    long_form = _samples(spark, sf_dir, n=20)
    path = str(tmp_path / "wds")
    write_webdataset(long_form, path, n_shards=2, key_col="sample_key")
    # plant a truncated tar and a non-tar payload
    good = sorted(
        f for f in os.listdir(path) if f.endswith(".tar")
    )
    raw = open(os.path.join(path, good[0]), "rb").read()
    with open(os.path.join(path, "shard-000099.tar"), "wb") as f:
        f.write(raw[: len(raw) // 3])  # torn mid-member
    with open(os.path.join(path, "shard-000098.tar"), "wb") as f:
        f.write(b"definitely not a tar file")

    back = read_webdataset(spark, path)
    quarantined = back.where(F.col("error").isNotNull())
    healthy = back.where(F.col("error").isNull())
    # stage completed; both bad shards flagged; every good member intact
    qpaths = {
        os.path.basename(r["shard_path"]) for r in quarantined.collect()
    }
    assert "shard-000098.tar" in qpaths
    # a torn tar either parses its complete prefix members or flags -
    # but it must never abort; whatever rows it yields are a subset of
    # the healthy originals plus at most one flagged row
    assert healthy.count() >= long_form.count()
    with tarfile.open(os.path.join(path, good[0])) as t:
        n_members = len([m for m in t.getmembers() if m.isfile()])
    assert n_members > 0
