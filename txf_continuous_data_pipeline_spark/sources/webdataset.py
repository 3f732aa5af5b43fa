"""WebDataset-style tar shard source and sink.

Beyond-the-reference extension: large-scale multimodal training jobs
consume corpora as directories of tar "shards", each holding a bounded
number of samples whose members are files named ``{key}.{ext}``
(``000017.txt``, ``000017.json``, ``000017.jpg`` ...) - the WebDataset
convention (public spec: github.com/webdataset/webdataset). The engine
therefore needs a sink that lays a DataFrame of samples out as
reproducible tar shards and a source that reads such shards back into a
DataFrame, both distributed.

Scale design (what survives 100 TB):
  - Shard ASSIGNMENT is a pure column expression supplied by the caller
    (default ``pmod(xxhash64(key), n_shards)``) - never a global
    ``row_number`` sort, which would funnel the corpus through one task.
    Hash sharding keeps the write embarrassingly parallel and makes the
    shard id recomputable by any reader.
  - One tar per shard id, built inside ``applyInPandas`` after a
    shuffle on the shard id: each task streams ONE shard's samples into
    an in-memory tar and writes it with an atomic rename
    (``.<name>.tmp`` then ``os.replace``), so readers never observe a
    torn shard and re-runs are idempotent (same bytes, same name).
    Shards are meant to be bounded (the WebDataset convention is
    100 MB - 1 GB); ``samples_per_shard`` at write time is a capacity
    HINT for choosing ``n_shards``, not a hard cap.
  - Tar bytes are REPRODUCIBLE: mtime=0, uid=gid=0, fixed uname/gname,
    USTAR format, members emitted in (key, ext) order. Writing the same
    frame twice yields byte-identical shards - the property a
    content-addressed store or a resumable backfill needs.
  - The reader goes through Spark's ``binaryFile`` source (one row per
    shard, partition-parallel across shards) and parses each tar with
    the stdlib inside ``mapInPandas`` - Arrow-batched, no Python in any
    per-member hot path beyond the unavoidable tar walk.
  - Malformed shards are QUARANTINED, not fatal: a truncated or
    non-tar payload yields a single flagged row (ext='', error set)
    instead of failing the stage - the same discipline as the media
    decoders (operators/multimodal._safe_decode): at 100 TB a corrupt
    shard is a certainty and one bad file must not kill the job.

Reference parity note: the reference pipeline (main.py) has no tar
source; this module is part of the LLM-training-data extension surface
the brief asks for.
"""

from __future__ import annotations

import io as _io
import os
import tarfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("path", StringType()),
        StructField("n_samples", LongType()),
        StructField("n_members", LongType()),
        StructField("shard_bytes", LongType()),
    ]
)

SAMPLE_SCHEMA = StructType(
    [
        StructField("shard_path", StringType()),
        StructField("sample_key", StringType()),
        StructField("ext", StringType()),
        StructField("payload", BinaryType()),
        StructField("error", StringType()),
    ]
)


def default_shard_id(key_col: str, n_shards: int) -> F.Column:
    """Deterministic, sort-free shard assignment: pmod(xxhash64(key), n).
    Any reader (or an oracle) can recompute it from the key alone."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("long")


def _shard_name(shard_id: int) -> str:
    return f"shard-{shard_id:06d}.tar"


def write_webdataset(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    key_col: str = "sample_key",
    shard_col: str | None = None,
) -> DataFrame:
    """Sink: long-format samples -> tar shards under `path`.

    `df` columns: `key_col` (string key), `ext` (member extension,
    no dot), `payload` (binary), and optionally `shard_col` (long in
    [0, n_shards)). Without `shard_col`, hash sharding via
    `default_shard_id` is applied - no global sort anywhere.

    One shuffle (hash on shard id), then each group becomes exactly one
    tar written atomically. Returns the manifest DataFrame (collected
    small - one row per shard - and reparallelized so callers can join
    or persist it)."""
    if shard_col is None:
        df = df.withColumn("__shard", default_shard_id(key_col, n_shards))
        shard_col = "__shard"
    os.makedirs(path, exist_ok=True)

    slim = df.select(
        F.col(shard_col).cast("long").alias("shard_id"),
        F.col(key_col).cast("string").alias("sample_key"),
        F.col("ext").cast("string").alias("ext"),
        F.col("payload").cast("binary").alias("payload"),
    )
    # Materialize BEFORE the validation count (the write_jsonl fix,
    # ADVICE r9 applied here too): without it the count re-executes
    # the caller's whole upstream pipeline a second time when the tar
    # write runs - column pruning drops the payload from the count's
    # plan, but not the upstream scans/joins that produced it.
    slim = slim.localCheckpoint(eager=True)
    # Validate the shard range BEFORE any file lands (the write_jsonl
    # discipline): a caller-supplied id outside [0, n_shards) would
    # either write a file the full-overwrite cleanup below deletes
    # (silent data loss) or a name the fixed-width pattern cannot
    # clean.
    n_bad = slim.where(
        (F.col("shard_id") < 0) | (F.col("shard_id") >= n_shards)
    ).count()
    if n_bad:
        raise ValueError(
            f"write_webdataset: {n_bad} rows have shard ids outside "
            f"[0, {n_shards}) - fix the shard expression or n_shards"
        )

    def _write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        # (key, ext) order => byte-reproducible shards regardless of
        # upstream row order.
        pdf = pdf.sort_values(["sample_key", "ext"], kind="mergesort")
        buf = _io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for key, ext, payload in zip(
                pdf["sample_key"], pdf["ext"], pdf["payload"]
            ):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                raw = bytes(payload) if payload is not None else b""
                info.size = len(raw)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, _io.BytesIO(raw))
        data = buf.getvalue()
        final = os.path.join(path, _shard_name(shard_id))
        tmp = os.path.join(path, f".{_shard_name(shard_id)}.tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)  # atomic: readers never see a torn shard
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "path": [final],
                "n_samples": [int(pdf["sample_key"].nunique())],
                "n_members": [len(pdf)],
                "shard_bytes": [len(data)],
            }
        )

    manifest = slim.groupBy("shard_id").applyInPandas(
        _write_one, MANIFEST_SCHEMA
    )
    spark = df.sparkSession
    # bounded: one row per shard
    rows = [r.asDict() for r in manifest.collect()]
    # FULL-overwrite semantics (ADVICE r9; the write_jsonl discipline):
    # the directory afterwards holds exactly shard-000000..n_shards-1
    # and nothing else. A shard id no row hashed to still gets a valid
    # EMPTY tar (the layout is not data-dependent), and stale shards
    # from an earlier, wider or differently-filtered write are removed
    # so read_webdataset can never silently mix old samples into a
    # rewritten corpus.
    import glob as _glob
    import re as _re

    written = {int(r["shard_id"]) for r in rows}
    for sid in sorted(set(range(n_shards)) - written):
        buf = _io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ):
            pass
        data = buf.getvalue()
        tmp = os.path.join(path, f".{_shard_name(sid)}.tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        final = os.path.join(path, _shard_name(sid))
        os.replace(tmp, final)
        rows.append(
            {
                "shard_id": sid,
                "path": final,
                "n_samples": 0,
                "n_members": 0,
                "shard_bytes": len(data),
            }
        )
    for f in _glob.glob(os.path.join(path, "shard-*.tar")):
        # \d{6,}: f"{sid:06d}" GROWS past 6 digits above 10^6 shards,
        # and a fixed-width pattern would silently skip cleaning them
        m = _re.fullmatch(r"shard-(\d{6,})\.tar", os.path.basename(f))
        if m and int(m.group(1)) >= n_shards:
            os.remove(f)
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Source: tar shards under `path` -> long-format samples.

    binaryFile gives one row per shard (partition-parallel across
    shards; shard size is bounded by the write convention, so one shard
    per Arrow batch is safe); the stdlib tar walk runs inside
    mapInPandas. A shard whose bytes do not parse as a tar yields ONE
    quarantine row (ext='', error=<reason>) instead of failing the
    stage."""
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches):
        for pdf in batches:
            out = {
                "shard_path": [],
                "sample_key": [],
                "ext": [],
                "payload": [],
                "error": [],
            }
            for spath, content in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(
                        fileobj=_io.BytesIO(bytes(content)), mode="r"
                    ) as tar:
                        for member in tar:
                            if not member.isfile():
                                continue
                            name = member.name
                            key, dot, ext = name.rpartition(".")
                            if not dot:
                                key, ext = name, ""
                            fobj = tar.extractfile(member)
                            payload = (
                                fobj.read() if fobj is not None else b""
                            )
                            # A tar truncated MID-member does not make
                            # extractfile().read() raise - it just
                            # returns short bytes - so verify the read
                            # length against the header's size and
                            # quarantine the member on mismatch
                            # (ADVICE r9: consumers filtering
                            # error IS NULL must never keep a torn
                            # payload as clean).
                            if len(payload) != member.size:
                                out["shard_path"].append(spath)
                                out["sample_key"].append(key)
                                out["ext"].append(ext)
                                out["payload"].append(None)
                                out["error"].append(
                                    "truncated member: got "
                                    f"{len(payload)} of {member.size} "
                                    "bytes"
                                )
                                continue
                            out["shard_path"].append(spath)
                            out["sample_key"].append(key)
                            out["ext"].append(ext)
                            out["payload"].append(payload)
                            out["error"].append(None)
                except (tarfile.TarError, EOFError, OSError) as exc:
                    # Quarantine, never abort: one corrupt shard in a
                    # 100-TB corpus must not kill the read stage.
                    out["shard_path"].append(spath)
                    out["sample_key"].append(None)
                    out["ext"].append("")
                    out["payload"].append(None)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return shards.mapInPandas(_parse, SAMPLE_SCHEMA)
