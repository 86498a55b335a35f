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
