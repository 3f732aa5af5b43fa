"""The exactly-once commit log every batch-layout ingest loop shares
(r11 verdict #6): ONE definition of the `batch=<id>` overwrite layout,
the `_SUCCESS` / data-file conventions, the strictly-earlier-batches
read snapshot, and the crash-safe rollup compactor - previously
re-implemented with small variations inside each of the 14 loops in
streaming/incremental.py. The contract:

  * every micro-batch OVERWRITES its own `batch=<id>` subdirectory,
    so an at-least-once replay rewrites identical bytes instead of
    double-appending (value-identity -> byte-identity requires the
    caller to pin row order for multi-row feeds - `write_batch`'s
    `order_by`);
  * readers consume either the WHOLE store (`spark.read.parquet(base)`
    - the `batch` partition column stays integer-typed across
    compaction because rollups use NEGATIVE ids) or, inside a loop,
    only STRICTLY EARLIER batches (`earlier_batch_dirs`), which is
    what makes a replayed batch see the exact snapshot its first
    attempt saw;
  * `compact_batch_store` rolls old batch dirs into one rollup with a
    commit-then-delete sequence that is crash-safe at every point.

Crash-recovery and replay byte-identity semantics are pinned by the
streaming pytest suites (tests/test_streaming_dedup.py's compactor
crash-window cases run against THIS module through the incremental
re-exports)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_batch(
    df: DataFrame,
    base: str,
    batch_id: int,
    *,
    single_file: bool = False,
    order_by: "list[str] | None" = None,
) -> None:
    """The one `batch=<id>` overwrite commit. `order_by` pins the row
    order (and implies a single output file): the exactly-once
    "redelivery rewrites identical bytes" claim must not rest on a
    hash aggregate's iteration order staying stable across replays
    under different memory pressure (r11 review finding) - byte
    identity must follow from value identity. `single_file` alone
    coalesces dimension-sized feeds (ledgers, stats rows) without
    imposing an order."""
    if order_by:
        df = df.orderBy(*order_by).coalesce(1)
    elif single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").parquet(
        os.path.join(base, f"batch={int(batch_id)}")
    )


def run_available_now(
    spark: SparkSession,
    feed_dir: str,
    work_dir: str,
    *,
    schema: "str | None" = None,
    stream: "DataFrame | None" = None,
    ingest,
    timeout_s: int,
    label: str,
) -> None:
    """The one availableNow micro-batch runner every ingest loop in
    this module shares (r10 review: it existed as verbatim copies per
    loop; r11 review: loops whose source is a TRANSFORMED stream - the
    realized-vol monitor's watermarked OHLCV - can pass it via
    `stream` instead of growing another scaffold copy): schema'd file
    stream over feed_dir (or the given stream), one file per trigger,
    checkpoint under work_dir/ckpt, `ingest(batch_df, batch_id)` as
    the foreachBatch body; raises on timeout (after stopping the
    query) and re-raises the stream's own exception."""
    if stream is None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(feed_dir)
        )
    q = (
        stream.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .foreachBatch(ingest)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"{label} exceeded {timeout_s}s")
    if q.exception() is not None:
        raise q.exception()


def has_parts(d: str) -> bool:
    """A batch/rollup dir holds real data files (an all-dropped batch
    writes only _SUCCESS). The ONE predicate the reader and the
    compactor share (r10 review wave 4)."""
    return any(f.startswith("part-") for f in os.listdir(d))


def earlier_batch_dirs(base: str, bid: int) -> "list[str]":
    """Subdirs of strictly earlier batches that hold data files (an
    all-dropped batch writes only _SUCCESS - no schema to read, and
    nothing to join against). Shared by every batch=<id>-layout ingest
    loop; reading ONLY strictly earlier batches is what makes a
    replayed batch see the exact snapshot its first attempt saw.

    Compaction-aware: compact_batch_store rolls batches 0..k into a
    `batch=-(k+1)` dir (a NEGATIVE id keeps the store's inferred
    `batch` partition column integer-typed for wholesale readers);
    the most negative such dir stands in for every live id <= k, and
    surviving batch dirs with id <= k (or superseded older rollups)
    are IGNORED - so the window between the rollup commit and the old
    dirs' garbage collection can never double-count."""
    if not os.path.isdir(base):
        return []
    upto = -1
    comp_dir = None
    for d in os.listdir(base):
        if d.startswith("batch=") and d[6:].startswith("-"):
            k = -int(d.split("=", 1)[1]) - 1
            if k > upto:
                upto, comp_dir = k, os.path.join(base, d)
    if bid <= upto:
        # the rollup covers THIS batch: a replay would read its own
        # first-attempt output standing in its input snapshot and
        # silently diverge (r10 review wave 4) - fail loudly instead;
        # the operator compacted batches that could still replay
        raise RuntimeError(
            f"batch {bid} replayed but {base} is compacted through "
            f"batch {upto} - its own output is inside the rollup; "
            "compact only batches that can no longer replay"
        )
    out = []
    if comp_dir is not None and has_parts(comp_dir):
        out.append(comp_dir)
    for d in os.listdir(base):
        if not d.startswith("batch="):
            continue
        i = int(d.split("=", 1)[1])
        if i < 0 or not (upto < i < bid):
            continue
        full = os.path.join(base, d)
        if has_parts(full):
            out.append(full)
    return out


def compact_batch_store(
    spark: SparkSession, base: str, upto: int, *, target_files: int = 1
) -> int:
    """Roll batch=<0..upto> partitions of ONE batch-layout store into
    a single `batch=-(upto+1)` rollup dir - the small-file maintenance
    the append-only ingest layouts need at 100 TB (every micro-batch
    adds a directory forever; index reads list and open them all).
    A NEGATIVE id keeps the store's inferred `batch` partition column
    integer-typed, so wholesale `spark.read.parquet(store)` readers
    keep working across the rollup.

    Safety contract: earlier_batch_dirs treats the most negative
    rollup as standing in for every id <= upto and ignores surviving
    batch dirs below it (and superseded older rollups), so the
    sequence commit-then-delete is crash-safe at every point: before
    the rollup's atomic rename nothing changed; after it, the stale
    dirs are invisible double-count-free garbage this function
    (re-run) or any janitor may remove. Only compact batches that can
    no longer REPLAY - upto must be < the stream's last committed
    batch id under a LIVE checkpoint (a replayed batch must never
    find its own output standing in its input snapshot; a full
    checkpoint reset already requires a fresh work_dir by the ingest
    loops' documented contract). Wholesale readers see both the
    rollup and the not-yet-deleted originals only inside this call's
    rename-to-rmtree window - compact during a read-quiet moment for
    stores read whole (kept/), any time for stores read via
    earlier_batch_dirs (indexes, ledgers, scores). Returns the
    number of batch dirs rolled up + removed. Idempotent: re-running
    with the same `upto` only garbage-collects leftovers."""
    import glob as _glob
    import shutil

    if not os.path.isdir(base):
        return 0
    # clean ALL stale staging leftovers (any upto - a crash during an
    # earlier attempt must not leak a rollup-sized copy forever; r10
    # review wave 4)
    for leftover in _glob.glob(base.rstrip("/") + "__rollup_*_staging"):
        shutil.rmtree(leftover, ignore_errors=True)
    target = os.path.join(base, f"batch=-{upto + 1}")
    victims = []
    prev_comp = []
    prev_cover = -1
    for d in os.listdir(base):
        if not d.startswith("batch="):
            continue
        i = int(d.split("=", 1)[1])
        if 0 <= i <= upto:
            victims.append((i, os.path.join(base, d)))
        elif i < 0 and -i - 1 < upto:
            prev_comp.append((-i - 1, os.path.join(base, d)))
            prev_cover = max(prev_cover, -i - 1)
    n = len(victims)
    if not os.path.exists(os.path.join(target, "_SUCCESS")):
        # sources: the SINGLE best previous rollup (older rollups and
        # any victim it already covers are stale duplicates - a crash
        # between a previous commit and its GC must not double-count
        # rows into the new rollup; r10 review wave 4) plus the
        # not-yet-covered victims that hold data
        best_prev = [
            path for cover, path in prev_comp if cover == prev_cover
        ][:1]
        sources = best_prev + [
            path
            for i, path in victims
            if i > prev_cover and has_parts(path)
        ]
        if sources:
            # staging lives OUTSIDE the store so partition discovery
            # never sees a non-key=value directory name mid-build
            staging = base.rstrip("/") + f"__rollup_{upto}_staging"
            shutil.rmtree(staging, ignore_errors=True)
            # target_files=1 suits test/index-sized stores; at 100 TB
            # pass the file count that keeps partitions inside
            # executor memory
            spark.read.parquet(*sources).coalesce(
                max(1, int(target_files))
            ).write.mode("overwrite").parquet(staging)
            shutil.rmtree(target, ignore_errors=True)
            os.rename(staging, target)
    # garbage-collect the rolled-up dirs (readers already ignore
    # them). This runs even when nothing needed rolling up - an
    # all-empty batch range still accumulates _SUCCESS-only dirs, the
    # exact listing cost compaction exists to remove.
    for _, v in victims:
        shutil.rmtree(v, ignore_errors=True)
    for _, v in prev_comp:
        shutil.rmtree(v, ignore_errors=True)
    return n
