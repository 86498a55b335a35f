"""Relational operators beyond stock DataFrame calls.

All ``[EXT]`` per SURVEY.md §2.2 — the reference contains no relational
operators (SURVEY.md §2.1: "Explicitly absent ... all join types, all
aggregations"). Everything here composes built-in Spark operators so Catalyst
keeps optimizing through them; no UDFs, no RDDs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_time <= left_time`` per key (ties match).

    Spark has no as-of primitive (SURVEY.md §2.2), so this uses the
    union + last(ignorenulls) over ordered window trick:

        L(key, t, payload, NULLs) UNION R(key, t, NULLs, payload)
        -> last(right cols, ignorenulls) over (partition key order t, side)
        -> keep left rows

    Cost model: exactly ONE shuffle on the key (the window's partitionBy) —
    the same exchange a sort-merge join would need, with no join explosion
    and no per-key driver loop, so it scales to 100 TB the way a SMJ does.
    Skewed keys are split by AQE.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    lpayload = [c for c in left.columns if c not in keys and c != left_time]
    rpayload = [c for c in right.columns if c not in keys and c != rt]

    rp_names = {c: (c + suffix if c in left.columns else c) for c in rpayload}
    rtime_out = rt + suffix if rt in left.columns or rt == left_time else rt

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lpayload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(rp_names[c]) for c in rpayload],
        F.lit(None).cast(right.schema[rt].dataType).alias(rtime_out),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(rt).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpayload],
        *[F.col(c).alias(rp_names[c]) for c in rpayload],
        F.col(rt).alias(rtime_out),
    )

    # right rows sort before left rows at equal time, so an equal-time right
    # row is visible to the left row (backward-inclusive semantics)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lhs.unionByName(rhs)
    for c in [*rp_names.values(), rtime_out]:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))

    out = filled.where(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("__t").cast("double") - F.col(rtime_out).cast("double")
        ) <= F.lit(float(tolerance_seconds))
        for c in rp_names.values():
            out = out.withColumn(c, F.when(within, F.col(c)))
        out = out.withColumn(rtime_out, F.when(within, F.col(rtime_out)))
    return out.select(
        *keys,
        F.col("__t").alias(left_time),
        *lpayload,
        *rp_names.values(),
        rtime_out,
    )


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number — map-side partial top-k is done
    by Spark's WindowGroupLimit pushdown (rank<=k filters push into the
    sort), so only ~k rows per group per partition reach the shuffle."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_seconds`` (island labeling
    via lag + running sum). One shuffle on the key."""
    w = Window.partitionBy(key).orderBy(ts)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
