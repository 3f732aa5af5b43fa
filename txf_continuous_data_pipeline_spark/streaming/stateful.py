"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (SURVEY.md 2.7 extension).

F.session_window covers the built-in case; this operator exists for the
semantics the built-in can't express - arbitrary per-session state and
emit-on-close outputs - and demonstrates the engine's custom-stateful
surface. Semantics are the batch twin's (operators/relational.sessionize
/ session_stats): events of one key belong to a session until a silence
STRICTLY longer than `gap`; a session closes when a newer event opens
the next one, or when the event-time watermark passes last_event + gap
(EventTimeTimeout), i.e. no on-time event can extend it anymore. Closed
sessions are emitted exactly once (append mode).

Scale shape: state is one fixed-width row (3 longs) per OPEN session per
key - bounded by active keys, not history; the watermark timeout
guarantees eviction. Arrow moves each key-group batch into pandas in one
block; the per-event fold is O(events in batch for that key). The
shuffle is the same hash-by-key exchange a streaming agg needs anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = (
    "start long, last long, n long, buf_ts array<long>"
)


def _to_us(series: pd.Series) -> pd.Series:
    """Event timestamps as int64 epoch-microseconds, whatever datetime64
    resolution Arrow handed over."""
    return pd.to_datetime(series).astype("datetime64[us]").astype("int64")


def _session_fold(gap_us: int):
    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            start, last, n, bts = state.get
            cur = (start, last, n) if start >= 0 else None
            buf = list(bts)
        else:
            cur, buf = None, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(int(t) for t in _to_us(pdf["ts"]))

        # Fold ONLY events the watermark has finalized (ts strictly
        # below it - an on-time event with ts == watermark can still
        # arrive), in sorted event-time order: cross-batch disorder
        # within the delay can therefore never split a session or
        # freeze session_start too late, which the previous
        # fold-on-arrival form got wrong on disordered feeds.
        ready = sorted(t for t in buf if t < wm_us)
        rest = [t for t in buf if t >= wm_us]
        closed: list[tuple[int, int, int]] = []
        for t in ready:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_us:
                closed.append(cur)
                cur = (t, t, 1)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
        # The open session is final only once the watermark passes its
        # close condition: every event that could still extend it has
        # ts >= wm > last + gap, which would start a NEW session.
        if cur is not None and cur[1] + gap_us < wm_us:
            closed.append(cur)
            cur = None

        if cur is None and not rest:
            if state.exists:
                state.remove()
        else:
            start, last, n = cur if cur is not None else (-1, -1, 0)
            state.update((start, last, n, rest))
            wm_ms = state.getCurrentWatermarkMs()
            if rest:
                # Buffered events become final on the next watermark
                # advance - re-fire as soon as it moves.
                state.setTimeoutTimestamp(wm_ms + 1)
            else:
                # Idle open session (no buffered tail): nothing can
                # finalize before the watermark passes last + gap, so
                # sleep until that close instant. Waking every key on
                # every watermark advance made per-micro-batch cost
                # O(all live keys) instead of O(keys with finalizable
                # work). Spark fires an event-time timeout when
                # watermark > timeout (strict), and the close condition
                # is wm_ms >= close_ms - so arm close_ms - 1, or a
                # watermark landing exactly on close_ms and then
                # freezing would leave a closable session unemitted.
                # Floor at wm_ms (equality is allowed by the API): a
                # wm_ms + 1 floor would re-open the same freeze gap
                # when the fold runs at wm_ms == close_ms - 1.
                close_ms = (last + gap_us) // 1000 + 1
                state.setTimeoutTimestamp(max(close_ms - 1, wm_ms))

        if closed:
            out = pd.DataFrame(
                closed, columns=["start_us", "last_us", "n_events"]
            )
            yield pd.DataFrame(
                {
                    "user_id": user,
                    "session_start": pd.to_datetime(
                        out["start_us"], unit="us"
                    ),
                    "session_end": pd.to_datetime(out["last_us"], unit="us"),
                    "n_events": out["n_events"].astype("int64"),
                }
            )

    return fold


def stateful_session_stream(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Emit-on-close session stats over a stream: one output row per
    CLOSED session (user_id, session_start, session_end, n_events) -
    row-equal to batch `session_stats` restricted to sessions the
    watermark has finalized."""
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fold(gap_us),
            SESSION_OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


FUNNEL_OUT_SCHEMA = (
    "user_id long, step_idx int, step string, ts timestamp"
)
_FUNNEL_STATE_SCHEMA = (
    "cursor int, last_t long, buf_ts array<long>, buf_id array<long>, "
    "buf_type array<string>"
)


def _funnel_fold(steps: tuple):
    n_steps = len(steps)

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            cursor, last_t_us, bts, bid, btyp = state.get
            buf = list(zip(list(bts), list(bid), list(btyp)))
        else:
            cursor, last_t_us, buf = 0, -1, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(
                    zip(
                        (int(t) for t in _to_us(pdf["ts"])),
                        (int(i) for i in pdf["event_id"]),
                        pdf["event_type"],
                    )
                )
        # Only events STRICTLY below the watermark are final (an
        # on-time event with ts == watermark can still arrive); fold
        # them in exact (ts, id) order. Advance requires ts strictly
        # greater than the previous step's - the batch twin's
        # (and the oracle's) strict-ts semantics.
        ready = sorted(e for e in buf if e[0] < wm_us)
        rest = [e for e in buf if e[0] >= wm_us]
        advances: list[tuple[int, str, int]] = []
        for t, _i, ty in ready:
            if (
                cursor < n_steps
                and ty == steps[cursor]
                and (cursor == 0 or t > last_t_us)
            ):
                cursor += 1
                last_t_us = t
                advances.append((cursor, steps[cursor - 1], t))
        if cursor >= n_steps and not rest:
            # funnel complete: no further advance is possible - drop
            # the state entirely
            if state.exists:
                state.remove()
        else:
            state.update(
                (
                    cursor,
                    last_t_us,
                    [e[0] for e in rest],
                    [e[1] for e in rest],
                    [e[2] for e in rest],
                )
            )
            if rest:
                # re-fire as soon as the watermark moves so buffered
                # events get folded even if this key sees no new data
                state.setTimeoutTimestamp(
                    state.getCurrentWatermarkMs() + 1
                )
        if advances:
            out = pd.DataFrame(
                advances, columns=["step_idx", "step", "t_us"]
            )
            yield pd.DataFrame(
                {
                    "user_id": user,
                    "step_idx": out["step_idx"].astype("int32"),
                    "step": out["step"],
                    "ts": pd.to_datetime(out["t_us"], unit="us"),
                }
            )

    return fold


def stateful_funnel_stream(
    stream: DataFrame,
    steps: tuple,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming ordered funnel: emit one row per step ADVANCE per user
    (user, step_idx, step, ts), exactly once, in step order - the
    streaming twin of operators/relational.funnel_step_times.

    Correctness contract: events are buffered in state until the
    event-time watermark finalizes them, then folded in exact (ts, id)
    order - so emitted advances match the batch fold for every event
    below the final watermark, with intra-batch AND bounded cross-batch
    disorder handled (anything within the watermark delay). Events
    arriving later than the watermark fold on arrival (best effort),
    the standard late-data trade.

    Scale shape: state per key = one int cursor + the buffered tail
    newer than the watermark (bounded by rate x delay, same bound as
    any watermarked agg); a COMPLETED funnel's state is dropped
    entirely. The shuffle is the hash-by-key exchange any per-user
    operator needs."""
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            _funnel_fold(tuple(steps)),
            FUNNEL_OUT_SCHEMA,
            _FUNNEL_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


SCD2_OUT_SCHEMA = (
    "user_id long, event_type string, valid_from timestamp, "
    "valid_to timestamp"
)
_SCD2_STATE_SCHEMA = (
    "open_from long, open_attr string, buf_ts array<long>, "
    "buf_id array<long>, buf_attr array<string>"
)


def _scd2_fold():
    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            open_from, open_attr, bts, bid, battr = state.get
            cur = (open_from, open_attr) if open_from >= 0 else None
            buf = list(zip(bts, bid, battr))
        else:
            cur, buf = None, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(
                    zip(
                        (int(t) for t in _to_us(pdf["ts"])),
                        (int(i) for i in pdf["event_id"]),
                        pdf["event_type"],
                    )
                )

        # Fold only watermark-finalized events, in (ts, id) order - the
        # same disorder discipline as the session fold: a late on-time
        # event inside the delay can never reorder runs after the fact.
        ready = sorted(r for r in buf if r[0] < wm_us)
        rest = [r for r in buf if r[0] >= wm_us]
        closed: list[tuple[str, int, int]] = []
        for t, _i, a in ready:
            if cur is None:
                cur = (t, a)
            elif a != cur[1]:
                closed.append((cur[1], cur[0], t))
                cur = (t, a)
        # The open run has no valid_to until a DIFFERENT value arrives -
        # SCD2 has no time-based close, so the open row is never emitted
        # in append mode (the batch twin's is_current row).

        if cur is None and not rest:
            if state.exists:
                state.remove()
        else:
            open_from, open_attr = cur if cur is not None else (-1, "")
            state.update(
                (
                    open_from,
                    open_attr,
                    [r[0] for r in rest],
                    [r[1] for r in rest],
                    [r[2] for r in rest],
                )
            )
            if rest:
                # Buffered events become final on the next watermark
                # advance - re-fire then. Without a buffered tail no
                # timeout is armed at all: only a new event can change
                # an SCD2 run, so idle keys sleep indefinitely (the
                # bounded-cost discipline the session fold documents).
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)

        if closed:
            out = pd.DataFrame(
                closed, columns=["event_type", "from_us", "to_us"]
            )
            yield pd.DataFrame(
                {
                    "user_id": user,
                    "event_type": out["event_type"],
                    "valid_from": pd.to_datetime(out["from_us"], unit="us"),
                    "valid_to": pd.to_datetime(out["to_us"], unit="us"),
                }
            )

    return fold


def stateful_scd2_stream(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming type-2 SCD history: one output row per CLOSED validity
    interval (user_id, event_type, valid_from, valid_to), row-equal to
    the batch twin operators/linkage.scd2_build restricted to intervals
    whose closing event the watermark has finalized. The open
    (is_current) interval is never emitted - it has no valid_to yet.

    State per key: the open run's (valid_from, value) plus the buffered
    not-yet-finalized tail - fixed width + O(late events within the
    delay), evicted as the watermark advances."""
    return (
        stream.withWatermark("ts", delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            _scd2_fold(),
            SCD2_OUT_SCHEMA,
            _SCD2_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


HH_OUT_SCHEMA = (
    "shard int, version long, item long, est long, dec long"
)
_HH_STATE_SCHEMA = (
    "version long, items array<long>, counts array<long>, dec long"
)


def _mg_fold(capacity: int):
    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        shard = key[0]
        if state.exists:
            version, items, counts, dec = state.get
            sketch = dict(zip(items, counts))
        else:
            version, sketch, dec = 0, {}, 0
        for pdf in pdfs:
            for it in pdf["item"]:
                it = int(it)
                if it in sketch:
                    sketch[it] += 1
                elif len(sketch) < capacity:
                    sketch[it] = 1
                else:
                    # Misra-Gries decrement step: every tracked count
                    # drops by one in lieu of admitting the new item;
                    # `dec` accumulates the total undercount bound.
                    dec += 1
                    sketch = {
                        k: c - 1 for k, c in sketch.items() if c > 1
                    }
        version += 1
        state.update(
            (version, list(sketch), [sketch[k] for k in sketch], dec)
        )
        yield pd.DataFrame(
            {
                "shard": shard,
                "version": version,
                "item": list(sketch),
                "est": [sketch[k] for k in sketch],
                "dec": dec,
            }
        )

    return fold


def stateful_heavy_hitters_stream(
    stream: DataFrame,
    *,
    item_col: str,
    n_shards: int = 8,
    capacity: int = 16,
) -> DataFrame:
    """Streaming heavy hitters with BOUNDED state: items shard by hash,
    each shard folds a Misra-Gries sketch of fixed capacity k in
    applyInPandasWithState — state is k (item, count) pairs + one
    decrement counter per shard, independent of stream length. The
    classic guarantee holds per shard: est <= true <= est + dec, and
    every item with true count > n_shard/(k+1) is present. Each batch
    emits the shard's full sketch stamped with a monotone version; the
    LATEST version per shard is the current answer (append sinks keep
    history, the consumer max-filters — the same pattern as the
    watermark sinks).

    The exact batch twin is the heavy_hitter_users query; the sketch is
    what replaces it when the key cardinality no longer fits a
    groupBy."""
    from pyspark.sql import functions as F

    sharded = stream.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col(item_col).alias("item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_fold(capacity),
        HH_OUT_SCHEMA,
        _HH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


GSTATS_OUT_SCHEMA = (
    "group string, version long, n long, mean double, m2 double"
)
_GSTATS_STATE_SCHEMA = "version long, n long, mean double, m2 double"


def _welford_fold():
    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        group = key[0]
        if state.exists:
            version, n, mean, m2 = state.get
        else:
            version, n, mean, m2 = 0, 0, 0.0, 0.0
        for pdf in pdfs:
            v = pdf["value"].to_numpy(dtype=float)
            v = v[~np.isnan(v)]
            nb = len(v)
            if nb == 0:
                continue
            mb = float(v.mean())
            m2b = float(((v - mb) ** 2).sum())
            # Chan's parallel variance merge: exact combination of two
            # (n, mean, M2) summaries - the same algebra a distributed
            # partial aggregate uses, applied state (+) batch.
            delta = mb - mean
            tot = n + nb
            mean = mean + delta * nb / tot
            m2 = m2 + m2b + delta * delta * n * nb / tot
            n = tot
        version += 1
        state.update((version, n, mean, m2))
        yield pd.DataFrame(
            {
                "group": [group],
                "version": [version],
                "n": [n],
                "mean": [mean],
                "m2": [m2],
            }
        )

    return fold


def stateful_group_stats_stream(
    stream: DataFrame,
    *,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming per-group running moments with O(1) state per group:
    (n, mean, M2) merged per micro-batch via Chan's parallel variance
    formula — the streaming twin of the batch z-score outlier stats
    (operators/profiling.group_zscore_outliers). Emits a versioned
    summary per batch; consumers max-filter the append sink (the same
    pattern as the heavy-hitter sketch). Sample variance = m2/(n-1)."""
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(value_col).cast("double").alias("value"),
    )
    return src.groupBy("group").applyInPandasWithState(
        _welford_fold(),
        GSTATS_OUT_SCHEMA,
        _GSTATS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
