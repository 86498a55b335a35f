"""Time-series operators: bucketing, gap-filling, interpolation — [EXT]
(SURVEY.md §2.2 north-star; the hypertable-style rollup surface.  The
reference has no time semantics at all — an SMT sees one record at a time.)

Design for scale: the time spine is generated *per key* with
``sequence()`` + ``explode`` (codegen, no driver loop, no cross join
against a global calendar), so a key that exists for one hour produces one
spine row, not the whole calendar; the spine join is key+bucket equi-join.
Fill methods are window functions over (key, bucket) — one shuffle, which
the spine construction already required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, step: str = "1 hour") -> Column:
    """Tumbling time bucket as a timestamp (hypertable ``time_bucket``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.window(c, step)["start"]


def bucket_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    aggs: list[Column],
    step: str = "1 hour",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-(key, bucket) aggregation — the continuous-aggregate shape."""
    return (
        df.withColumn(bucket_col, time_bucket(ts_col, step))
        .groupBy(*key_cols, bucket_col)
        .agg(*aggs)
    )


def gap_fill(
    rolled: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    step_seconds: int = 3600,
    fill: dict[str, str] | None = None,
) -> DataFrame:
    """Densify a rolled-up series: emit one row per key per ``step_seconds``
    bucket between that key's first and last observation, filling gaps per
    column: ``"zero"`` (0), ``"locf"`` (last observation carried forward),
    ``"interp"`` (linear interpolation between the surrounding observations —
    integer columns only: the interpolant is the exact integer division
    ``(v0*(t1-t) + v1*(t-t0)) div (t1-t0)`` over epoch seconds, so results
    are bit-identical cross-engine for non-negative values; boundary gaps
    with no observation on one side stay NULL), ``"null"`` (leave missing).

    The spine is built from each key's own [min, max] bucket range via
    ``sequence()`` — no global calendar cross-join, so sparse keys stay
    cheap and the operator scales with actual data, not with
    #keys x #buckets.
    """
    fill = fill or {}
    value_cols = [c for c in rolled.columns if c not in key_cols + [bucket_col]]
    bad = [c for c, m in fill.items() if c not in value_cols]
    if bad:
        raise ValueError(f"fill targets not in frame: {bad}")
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    spine = (
        rolled.groupBy(*key_cols)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias(bucket_col),
        )
    )
    dense = spine.join(rolled, [*key_cols, bucket_col], "left")
    out_cols: list[Column] = [F.col(c) for c in key_cols] + [F.col(bucket_col)]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.col(bucket_col).cast("long")
    interp_cols: list[str] = []
    for c in value_cols:
        method = fill.get(c, "null")
        if method == "zero":
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif method == "locf":
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
        elif method == "interp":
            # stage the surrounding OBSERVED (time, value) pairs — the slope
            # must use observation buckets, not adjacent spine rows; both
            # window passes share the one (keys, bucket) sort
            obs_t = F.when(F.col(c).isNotNull(), t)
            out_cols.append(F.col(c))
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(f"__v0_{c}"))
            out_cols.append(F.last(obs_t, ignorenulls=True).over(w).alias(f"__t0_{c}"))
            out_cols.append(
                F.first(F.col(c), ignorenulls=True).over(w_fwd).alias(f"__v1_{c}")
            )
            out_cols.append(F.first(obs_t, ignorenulls=True).over(w_fwd).alias(f"__t1_{c}"))
            interp_cols.append(c)
        elif method == "null":
            out_cols.append(F.col(c))
        else:
            raise ValueError(f"unknown fill method {method!r} for column {c!r}")
    staged = dense.select(*out_cols)
    if not interp_cols:
        return staged
    final_cols: list[Column] = [F.col(c) for c in key_cols] + [F.col(bucket_col)]
    for c in value_cols:
        if c in interp_cols:
            # exact integer interpolation: `div` truncates == floor for the
            # non-negative domain; boundary gaps (one side unobserved) -> NULL
            final_cols.append(
                F.coalesce(
                    F.col(c),
                    F.expr(
                        f"(__v0_{c} * (__t1_{c} - CAST({bucket_col} AS LONG))"
                        f" + __v1_{c} * (CAST({bucket_col} AS LONG) - __t0_{c}))"
                        f" div (__t1_{c} - __t0_{c})"
                    ),
                ).alias(c)
            )
        else:
            final_cols.append(F.col(c))
    return staged.select(*final_cols)


def interval_coverage(
    df: DataFrame, key: str, start: str, end: str
) -> DataFrame:
    """Merge overlapping / touching half-open ``[start, end)`` intervals per
    key into maximal islands — the classic "total covered time from
    overlapping sessions" primitive (interval union).

    Single per-key sort-window pass: a row starts a new island iff its start
    exceeds the running max of all earlier ends (ROWS … 1 PRECEDING), the
    island id is the running sum of those breaks, and one hash aggregation
    collapses each island to ``(key, island_start, island_end)``. Exactly one
    shuffle on `key`; with int64 epoch columns every value is exact, so the
    result is engine-comparable bit-for-bit. At 100 TB the only concern is a
    single hot key owning millions of intervals — the window is sequential
    per key, so pre-split pathological keys by coarse time range first.
    """
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_max.isNull() | (F.col(start) > prev_max), 1).otherwise(0)
    islands = (
        df.select(key, start, end)
        .withColumn("__brk", brk)
        .withColumn(
            "__island",
            F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return islands.groupBy(key, "__island").agg(
        F.min(start).alias("island_start"), F.max(end).alias("island_end")
    ).drop("__island")
