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


def test_webdataset_truncated_member_is_quarantined(
    spark, sf_dir, tmp_path
):
    """ADVICE r9 (medium): a consumer filtering error IS NULL must
    never keep a torn payload as clean. On this Python (3.11)
    extractfile().read() raises ReadError at the truncation point, so
    the torn member lands in the shard-level quarantine; the reader
    ADDITIONALLY length-checks every member against its header size
    (the 'truncated member' row) for tarfile paths that return short
    bytes without raising. This test pins the CONTRACT: every clean
    row is byte-identical to an original, and the torn shard is
    flagged one way or the other."""
    long_form = _samples(spark, sf_dir, n=8)
    path = str(tmp_path / "wds")
    write_webdataset(long_form, path, n_shards=1, key_col="sample_key")
    shard = os.path.join(path, "shard-000000.tar")
    raw = open(shard, "rb").read()
    with tarfile.open(shard) as t:
        members = [m for m in t.getmembers() if m.isfile()]
    # cut INSIDE the last member's payload: keep its 512-byte header
    # and half its data, so the walk yields it with short bytes
    last = members[-1]
    cut = last.offset + 512 + max(1, last.size // 2)
    with open(
        os.path.join(path, "shard-000001.tar"), "wb"
    ) as f:  # planted torn twin
        f.write(raw[:cut])

    back = read_webdataset(spark, path).collect()
    originals = {
        (r["sample_key"], r["ext"]): bytes(r["payload"])
        for r in long_form.collect()
    }
    torn_flagged = False
    for r in back:
        if r["error"] is None:
            key = (r["sample_key"], r["ext"])
            assert bytes(r["payload"]) == originals[key], (
                f"clean row {key} carries torn bytes"
            )
        else:
            assert r["payload"] is None
            if r["shard_path"].endswith("shard-000001.tar"):
                torn_flagged = True
    assert torn_flagged, "torn shard produced no quarantine row"


def test_webdataset_write_is_full_overwrite(spark, sf_dir, tmp_path):
    """ADVICE r9 (low): re-writing a path with fewer shards or a
    narrower filter must not leave stale shard files for
    read_webdataset to silently mix in - and a shard id no row hashed
    to still gets a valid empty tar (layout is not data-dependent)."""
    long_form = _samples(spark, sf_dir, n=20)
    path = str(tmp_path / "wds")
    write_webdataset(long_form, path, n_shards=5, key_col="sample_key")
    assert len([f for f in os.listdir(path) if f.endswith(".tar")]) == 5

    narrow = long_form.limit(1)
    manifest = write_webdataset(
        narrow, path, n_shards=2, key_col="sample_key"
    )
    tars = sorted(f for f in os.listdir(path) if f.endswith(".tar"))
    assert tars == ["shard-000000.tar", "shard-000001.tar"]
    mrows = {r["shard_id"]: r for r in manifest.collect()}
    assert set(mrows) == {0, 1}  # manifest covers filled empties too
    for r in mrows.values():
        assert os.path.getsize(r["path"]) == r["shard_bytes"]
    back = read_webdataset(spark, path)
    assert back.where(F.col("error").isNotNull()).count() == 0
    assert back.where(F.col("sample_key").isNotNull()).count() == 1


def test_webdataset_out_of_range_shard_raises(spark, sf_dir, tmp_path):
    import pytest

    long_form = _samples(spark, sf_dir, n=6).withColumn(
        "sid", F.lit(7).cast("long")
    )
    with pytest.raises(ValueError, match="outside"):
        write_webdataset(
            long_form,
            str(tmp_path / "wds"),
            n_shards=2,
            key_col="sample_key",
            shard_col="sid",
        )
