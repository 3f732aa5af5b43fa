"""JSONL (newline-delimited JSON) shard source and sink.

Beyond-the-reference extension: JSONL is the lingua franca of LLM
training corpora (The Pile, RedPajama, FineWeb, Dolma all ship as
.jsonl shards), so the engine needs a sink that lays a DataFrame out
as reproducible JSONL shards and a source that reads such shards back
with malformed lines QUARANTINED rather than fatal.

Scale design (the write_webdataset discipline, applied to text):
  - Shard ASSIGNMENT is a pure column expression (caller-supplied, or
    pmod(xxhash64(key), n_shards)) - never a global row_number sort.
  - One file per shard id via applyInPandas after a shuffle on the
    shard id; bytes land with an atomic rename (.tmp then os.replace)
    so readers never observe a torn shard and re-runs are idempotent.
  - Shard bytes are REPRODUCIBLE: records are serialized with Spark's
    to_json (struct field order, no whitespace variance) and emitted
    in key order within the shard, so the same frame writes the same
    bytes - the content-addressed-store / resumable-backfill property.
  - The reader is Spark's native json source (partition-parallel,
    predicate/column pruning apply) in PERMISSIVE mode with an
    explicit corrupt-record column: a malformed line becomes one
    quarantine row (fields null, bad_record set) instead of killing
    the stage - the media-decoder discipline
    (operators/multimodal._safe_decode) for text.

Reference parity note: the reference pipeline (main.py) reads parquet
and CSV-ish config only; this module is part of the LLM-training-data
extension surface the brief asks for.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    key_col: str,
    shard_col: str | None = None,
) -> None:
    """Sink: one reproducible ``shard-%05d.jsonl`` file per shard id.

    Every column except the shard column becomes the JSON record
    (struct field order = column order, deterministic) - the key
    column IS serialized, so a read_jsonl round trip recovers it.
    Records within a shard are written in ``key_col`` order; files
    land via atomic rename.
    """
    shard = (
        F.col(shard_col)
        if shard_col
        else F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    payload_cols = [
        c for c in df.columns if c not in (shard_col or "", "_shard")
    ]
    rec = df.select(
        shard.cast("long").alias("_shard"),
        F.col(key_col).alias("_key"),
        F.to_json(F.struct(*payload_cols)).alias("_line"),
    )
    # Validate the shard range BEFORE any file lands: a caller-supplied
    # shard outside [0, n_shards) would write a file the full-overwrite
    # cleanup below then deletes (silent data loss), or a name the
    # fixed-width pattern cannot clean. Loud beats silent.
    # Materialize first (ADVICE r9): without it the validation count
    # re-executes the caller's whole upstream pipeline a second time
    # when the write runs (column pruning drops _line from the count's
    # plan, but not the upstream scan/joins). One eager checkpoint =
    # one upstream execution; both the count and the write read blocks.
    rec = rec.localCheckpoint(eager=True)
    n_bad = rec.where(
        (F.col("_shard") < 0) | (F.col("_shard") >= n_shards)
    ).count()
    if n_bad:
        raise ValueError(
            f"write_jsonl: {n_bad} rows have shard ids outside "
            f"[0, {n_shards}) - fix the shard expression or n_shards"
        )
    os.makedirs(path, exist_ok=True)

    def _write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"shard_id": [], "n_rows": []})
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_key")
        name = os.path.join(path, f"shard-{sid:05d}.jsonl")
        tmp = os.path.join(path, f".shard-{sid:05d}.jsonl.tmp")
        with open(tmp, "wb") as f:
            f.write(
                ("\n".join(pdf["_line"].tolist()) + "\n").encode("utf-8")
            )
        os.replace(tmp, name)
        return pd.DataFrame({"shard_id": [sid], "n_rows": [len(pdf)]})

    written = {
        int(r["shard_id"])
        for r in (
            # groupBy supplies the shard-keyed exchange itself; no
            # pre-repartition needed
            rec.groupBy("_shard")
            .applyInPandas(_write_one, "shard_id long, n_rows long")
            .collect()  # bounded: one row per shard
        )
    }
    # FULL-overwrite semantics: the directory afterwards holds exactly
    # shard-00000..n_shards-1 and nothing else. A shard id no row
    # hashed to still gets an (empty) file - the layout is not
    # data-dependent - and stale shards from an earlier, wider or
    # differently-filtered write are removed, so read_jsonl can never
    # silently mix old records into a rewritten corpus.
    import glob as _glob
    import re as _re

    for sid in set(range(n_shards)) - written:
        tmp = os.path.join(path, f".shard-{sid:05d}.jsonl.tmp")
        with open(tmp, "wb"):
            pass
        os.replace(tmp, os.path.join(path, f"shard-{sid:05d}.jsonl"))
    for f in _glob.glob(os.path.join(path, "shard-*.jsonl")):
        # \d{5,}: the %05d name grows past 5 digits above 10^5 shards
        m = _re.fullmatch(r"shard-(\d{5,})\.jsonl", os.path.basename(f))
        if m and int(m.group(1)) >= n_shards:
            os.remove(f)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    bad_record_col: str = "bad_record",
) -> DataFrame:
    """Source: JSONL shards -> DataFrame with malformed lines
    quarantined. The returned frame carries ``schema``'s fields plus
    ``bad_record_col`` (null for clean rows, the raw line for
    quarantined ones - count it, don't crash).

    Spark caveat (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN):
    a query whose referenced columns are ONLY the corrupt column
    (e.g. ``df.where(col(bad).isNotNull()).count()`` straight off the
    scan) is rejected by Spark - the json reader cannot prune to the
    internal corrupt column alone. Reference at least one data column
    alongside it, or materialize first; the quarantine pytest shows
    both working forms."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    full = StructType(
        list(schema.fields) + [StructField(bad_record_col, StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", bad_record_col)
        .json(path)
    )
