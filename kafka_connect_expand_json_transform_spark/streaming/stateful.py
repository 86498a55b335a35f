"""Arbitrary stateful streaming via ``applyInPandasWithState`` — [EXT]
(SURVEY.md §2.2 Streaming "arbitrary state"). The reference is stateless per
record (its only state, the schema LRU, is a cache — ExpandJson.java:73,81);
real pipelines need running per-key state that survives micro-batches.

Scale notes: state lives partitioned by the grouping key in the state store
(one shuffle on the key per batch); Arrow batches cross the JVM/Python
boundary, so per-key work is vectorized pandas, not per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def running_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    output_mode: str = "update",
) -> DataFrame:
    """Per-key running ``(count, sum, min, max)`` maintained across
    micro-batches — the canonical custom-stateful-operator shape.

    Emits one row per key per micro-batch with the totals *so far*. Composes
    with a downstream sink in ``update`` mode.
    """
    key_fields = [StructField(k, df.schema[k].dataType, True) for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("n", LongType(), False),
            StructField("total", DoubleType(), True),
            StructField("min_value", DoubleType(), True),
            StructField("max_value", DoubleType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("total", DoubleType(), False),
            StructField("min_value", DoubleType(), False),
            StructField("max_value", DoubleType(), False),
        ]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, mn, mx = state.get
        else:
            n, total, mn, mx = 0, 0.0, float("inf"), float("-inf")
        for pdf in pdfs:
            vals = pd.to_numeric(pdf[value_col], errors="coerce").dropna()
            if len(vals):
                n += int(len(vals))
                total += float(vals.sum())
                mn = min(mn, float(vals.min()))
                mx = max(mx, float(vals.max()))
        state.update((n, total, mn, mx))
        yield pd.DataFrame(
            [
                dict(
                    zip([f.name for f in key_fields], key),
                    n=n,
                    total=total,
                    min_value=None if n == 0 else mn,
                    max_value=None if n == 0 else mx,
                )
            ]
        )

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, output_mode, GroupStateTimeout.NoTimeout
    )


def _merge_sessionize(ts, gap_ms: int, stored):
    """The sessionization core shared by ``timeout_sessions`` (aPWS) and
    ``timeout_sessions_tws`` (transformWithStateInPandas) — one
    implementation, so the two APIs cannot drift semantically.

    ``ts``: sorted int64 epoch-ms numpy array; ``stored``: the open
    session ``(start_ms, end_ms, n)`` or None.  Returns
    ``(closed_starts, closed_ns, open_state)`` where the arrays hold the
    sessions this batch CLOSED and ``open_state`` is the new trailing open
    session.  In-watermark stragglers at or before the stored end merge by
    min(start) without moving the end backwards and without participating
    in the gap-diff (see timeout_sessions' docstring)."""
    import numpy as np

    start_merged = None
    if stored is not None:
        start_ms, end_ms, n0 = stored
        inside = int(np.searchsorted(ts, end_ms, side="right"))
        n_merged = n0 + inside
        start_merged = min(start_ms, int(ts[0])) if inside else start_ms
        ts = ts[inside:]
        if len(ts) == 0:
            # pure straggler batch: absorbed; end (and timer) unchanged
            empty = np.empty(0, dtype=np.int64)
            return empty, empty, (start_merged, end_ms, n_merged)
    # VECTORIZED sessionization (the per-row python loop measured
    # ~21-31 us/row at the sf1/sf10 smokes — 314 s for 10 M rows; the
    # numpy split is the same semantics at array speed): a session break
    # sits wherever the inter-event gap reaches gap_ms
    starts = np.flatnonzero(np.diff(ts) >= gap_ms) + 1  # segment starts
    bounds = np.concatenate(([0], starts, [len(ts)]))
    seg_start = ts[bounds[:-1]]
    seg_n = np.diff(bounds)
    if start_merged is not None:
        if int(ts[0]) - end_ms < gap_ms:  # first segment extends it
            seg_start[0] = start_merged
            seg_n[0] += n_merged
        else:  # the stored open session closes ahead of every segment
            seg_start = np.concatenate(([start_merged], seg_start))
            seg_n = np.concatenate(([n_merged], seg_n))
    open_state = (int(seg_start[-1]), int(ts[-1]), int(seg_n[-1]))
    return seg_start[:-1], seg_n[:-1], open_state


def timeout_sessions(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_ms: int,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Gap-based sessionization with EVENT-TIME TIMEOUT emission — the
    stateful-timer capability ``session_window`` cannot express (it emits on
    its own schedule; this operator owns the timer): per key, events within
    ``gap_ms`` of the session's end extend it, an event at or past the gap
    closes it (emitted immediately), and the trailing OPEN session is closed
    by the state store's event-time timer when the watermark passes
    ``end + gap`` (``GroupStateTimeout.EventTimeTimeout`` +
    ``state.setTimeoutTimestamp``; measured semantics on Spark 4.1: a timer
    fires iff ``timer_ts < watermark``, strict, including in the final
    no-data micro-batch a watermark advance schedules).  Sessions whose
    timer never passes the final watermark stay in state, unemitted — the
    exactly-once contract for readers is "a session row is emitted once,
    when it provably cannot grow".

    The reference is stateless per record (ExpandJson.java:96-129); this is
    the [EXT] arbitrary-state surface mandated by SURVEY §2.2.  Scale: one
    shuffle on ``key`` per batch; state is one (start, end, n) triple per
    OPEN session — closed sessions leave the store immediately, so state
    size is bounded by live keys, not history.  Timestamps are handled as
    int64 epoch-ms (floor from Spark's micros), matching the watermark's
    own ms arithmetic exactly.

    Emits ``(key, session_start_ms, n_events)`` rows in append mode.
    """
    out_schema = StructType(
        [
            StructField(key, df.schema[key].dataType, True),
            StructField("session_start_ms", LongType(), False),
            StructField("n_events", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType(), False),
            StructField("end_ms", LongType(), False),
            StructField("n", LongType(), False),
        ]
    )

    def update(k, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start_ms, _end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {key: [k[0]], "session_start_ms": [start_ms], "n_events": [n]}
            )
            return
        import numpy as np

        # unit-proof epoch-ms floor: Arrow may hand datetime64[ns] or [us]
        chunks = [
            p[ts_col].values.astype("datetime64[ms]").astype("int64")
            for p in pdfs
            if len(p)
        ]
        if not chunks:  # defensive: no data, keep state as-is
            return
        ts = np.sort(np.concatenate(chunks))
        # _merge_sessionize owns the semantics: gap-diff segmentation plus
        # the in-watermark straggler merge (events at or before the stored
        # end merge by min(start), never move the end/timer backwards, and
        # never manufacture breaks the session already bridges)
        stored = tuple(state.get) if state.exists else None
        closed_starts, closed_ns, open_state = _merge_sessionize(
            ts, gap_ms, stored
        )
        state.update(open_state)
        state.setTimeoutTimestamp(open_state[1] + gap_ms)
        if len(closed_starts):  # all but the trailing open session are final
            yield pd.DataFrame(
                {
                    key: [k[0]] * len(closed_starts),
                    "session_start_ms": closed_starts,
                    "n_events": closed_ns,
                }
            )

    watermarked = df.withWatermark(ts_col, watermark_delay)
    return watermarked.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def running_aggregate_tws(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    output_mode: str = "Update",
) -> DataFrame:
    """Same running (count, sum, min, max) on the Spark 4
    ``transformWithStateInPandas`` API — typed per-key ValueState managed by
    the RocksDB-backed state store (the forward-looking replacement for
    ``applyInPandasWithState``; both are exposed so pipelines can migrate).

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (set it on the session before starting the
    query; tests do) and the ``google.protobuf`` package (the TWS state
    server speaks protobuf; environments without it should use
    :func:`running_aggregate`, which is dependency-free).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_fields = [StructField(k, df.schema[k].dataType, True) for k in keys]
    key_names = [f.name for f in key_fields]
    out_schema = StructType(
        key_fields
        + [
            StructField("n", LongType(), False),
            StructField("total", DoubleType(), True),
            StructField("min_value", DoubleType(), True),
            StructField("max_value", DoubleType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("total", DoubleType(), False),
            StructField("min_value", DoubleType(), False),
            StructField("max_value", DoubleType(), False),
        ]
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, mn, mx = self._state.get()
            else:
                n, total, mn, mx = 0, 0.0, float("inf"), float("-inf")
            for pdf in rows:
                vals = pd.to_numeric(pdf[value_col], errors="coerce").dropna()
                if len(vals):
                    n += int(len(vals))
                    total += float(vals.sum())
                    mn = min(mn, float(vals.min()))
                    mx = max(mx, float(vals.max()))
            self._state.update((n, total, mn, mx))
            yield pd.DataFrame(
                [
                    dict(
                        zip(key_names, key),
                        n=n,
                        total=total,
                        min_value=None if n == 0 else mn,
                        max_value=None if n == 0 else mx,
                    )
                ]
            )

        def close(self) -> None:
            pass

    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=RunningAgg(),
        outputStructType=out_schema,
        outputMode=output_mode,
        timeMode="None",
    )


def timeout_sessions_tws(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_ms: int,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """:func:`timeout_sessions` on the Spark-4-native
    ``transformWithStateInPandas`` API (VERDICT r06 ask#7 — the migration
    twin; aPWS workloads are headed to TWS).  Identical semantics by
    construction: both call :func:`_merge_sessionize` for the straggler-
    safe gap segmentation; the only API-specific code is the state/timer
    wiring — TWS exposes FIRST-CLASS named timers (``registerTimer`` /
    ``deleteTimer`` per key) instead of aPWS's single implicit timeout
    timestamp, so the open session's timer is explicitly re-pointed as the
    session extends.

    Same environment needs as :func:`running_aggregate_tws`: the RocksDB
    state-store provider and ``google.protobuf`` (the TWS state server's
    protocol) — environments without them keep :func:`timeout_sessions`,
    which is dependency-free.  Emits ``(key, session_start_ms, n_events)``
    in append mode, timer-closed like the aPWS twin."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [
            StructField(key, df.schema[key].dataType, True),
            StructField("session_start_ms", LongType(), False),
            StructField("n_events", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType(), False),
            StructField("end_ms", LongType(), False),
            StructField("n", LongType(), False),
        ]
    )

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("open_session", state_schema)

        def handleInputRows(self, k, rows, timerValues):
            import numpy as np

            chunks = [
                p[ts_col].values.astype("datetime64[ms]").astype("int64")
                for p in rows
                if len(p)
            ]
            if not chunks:
                return
            ts = np.sort(np.concatenate(chunks))
            stored = (
                tuple(self._state.get()) if self._state.exists() else None
            )
            closed_starts, closed_ns, open_state = _merge_sessionize(
                ts, gap_ms, stored
            )
            # re-point the key's session timer at the (possibly extended)
            # open session's close; TWS timers are explicit, so the stale
            # one is deleted rather than overwritten
            if stored is not None:
                self._handle.deleteTimer(stored[1] + gap_ms)
            self._handle.registerTimer(open_state[1] + gap_ms)
            self._state.update(open_state)
            if len(closed_starts):
                yield pd.DataFrame(
                    {
                        key: [k[0]] * len(closed_starts),
                        "session_start_ms": closed_starts,
                        "n_events": closed_ns,
                    }
                )

        def handleExpiredTimer(self, k, timerValues, expiredTimerInfo):
            if not self._state.exists():
                return
            start_ms, end_ms, n = self._state.get()
            # only the LIVE timer (end + gap) closes the session; a stale
            # timer that survived a crash between delete and re-register
            # must not emit a still-growing session early
            if expiredTimerInfo.getExpiryTimeInMs() < end_ms + gap_ms:
                return
            self._state.clear()
            yield pd.DataFrame(
                {
                    key: [k[0]],
                    "session_start_ms": [start_ms],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    watermarked = df.withWatermark(ts_col, watermark_delay)
    return watermarked.groupBy(key).transformWithStateInPandas(
        statefulProcessor=Sessionizer(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
    )
