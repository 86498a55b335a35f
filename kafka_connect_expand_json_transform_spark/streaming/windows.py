"""Event-time windowed aggregation + stream dedup — [EXT] (SURVEY.md §2.2
Streaming; the reference has no time semantics at all, SURVEY.md §2.1).

All functions accept batch *or* streaming DataFrames: the same window
expressions run in both modes, which is how the batch twins in
``plans.queries`` (window_tumbling, session_windows) share semantics with the
streaming paths tested in ``tests/test_streaming.py``.

Scale notes: a watermarked windowed agg shuffles once on (window, keys) and
keeps only in-watermark state per key — state size is bounded by
(active windows × keys), not by stream length. Skewed keys are split by AQE in
batch; in streaming, keep key cardinality per window below executor memory or
pre-bucket the key.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def _agg(grouped, aggs: Mapping[str, Column]) -> DataFrame:
    return grouped.agg(*[c.alias(name) for name, c in aggs.items()])


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows: ``window(ts, duration)``."""
    df = _with_watermark(df, ts_col, watermark)
    return _agg(df.groupBy(F.window(ts_col, duration).alias("window"), *keys), aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    df = _with_watermark(df, ts_col, watermark)
    return _agg(df.groupBy(F.window(ts_col, duration, slide).alias("window"), *keys), aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str | Column,
    aggs: Mapping[str, Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic-size session windows: events of a key merge while consecutive
    gaps stay under ``gap`` — a duration string, or a Column expression for
    PER-EVENT dynamic gaps (Spark 3.2+). Streaming requires a watermark
    (unbounded state otherwise) — enforced here rather than left to a
    runtime error."""
    if df.isStreaming and not watermark:
        raise ValueError("streaming session windows require a watermark")
    df = _with_watermark(df, ts_col, watermark)
    return _agg(
        df.groupBy(F.session_window(ts_col, gap).alias("session_window"), *keys), aggs
    )


def stream_dedup(
    df: DataFrame,
    subset: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Drop duplicate records by key columns.

    With a watermark, uses ``dropDuplicatesWithinWatermark`` so per-key state
    expires once the key's event time falls behind the watermark — the only
    formulation whose state is bounded on an infinite stream. Without one
    (batch, or explicitly unbounded streams), plain ``dropDuplicates``.
    """
    if watermark:
        if not ts_col:
            raise ValueError("watermarked dedup needs ts_col")
        wm = df.withWatermark(ts_col, watermark)
        if wm.isStreaming:
            return wm.dropDuplicatesWithinWatermark(list(subset))
        return wm.dropDuplicates(list(subset))
    return df.dropDuplicates(list(subset))
