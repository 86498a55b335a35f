"""Data profiling operators — [EXT]: the accounting surface a 100 TB pipeline
runs before committing to a plan (skew detection before choosing a join
strategy, numeric profiles before choosing partition bounds).

All single-pass, partial-aggregated, shuffle-on-group-keys-only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summarize_numeric(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str] = (),
    round_to: int = 4,
) -> DataFrame:
    """Per-group numeric profile: n, min, max, mean, sample-stddev.

    One hash aggregation (partial+final); floats rounded so profiles are
    engine-comparable and stable across partitionings.
    """
    if isinstance(group_by, str):
        group_by = [group_by]
    v = F.col(value_col)
    aggs = [
        F.count(v).alias("n"),
        F.round(F.min(v), round_to).alias("min_value"),
        F.round(F.max(v), round_to).alias("max_value"),
        F.round(F.avg(v), round_to).alias("mean_value"),
        F.round(F.stddev_samp(v), round_to).alias("stddev_value"),
    ]
    return df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)


def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    top_n: int = 20,
) -> DataFrame:
    """Top-N hottest keys with their share of all rows and skew factor
    (count / mean-count-per-key) — the number that says whether a join on
    this key needs salting (``salted_join``) or AQE will cope.

    Two aggregations (key counts, then global stats broadcast back) — never
    collects keys to the driver.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    reserved = {"key_count", "row_share", "skew_factor"}
    clash = reserved.intersection(keys)
    if clash:
        raise ValueError(f"key column(s) {sorted(clash)} collide with report output columns")
    counts = df.groupBy(*keys).agg(F.count("*").alias("__kc"))
    totals = counts.agg(
        F.sum("__kc").alias("__total"),
        F.avg("__kc").alias("__mean"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            F.col("__kc").alias("key_count"),
            F.round(F.col("__kc") / F.col("__total"), 6).alias("row_share"),
            F.round(F.col("__kc") / F.col("__mean"), 4).alias("skew_factor"),
        )
        .orderBy(F.col("key_count").desc(), *keys)
        .limit(top_n)
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Exact corpus-wide top-k values by frequency, deterministically
    tie-broken on the value itself. Two-phase by construction: partial
    counts map-side, one shuffle on the value, then a global TakeOrdered of
    k rows — never a full sort of the distinct-value space."""
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "value")
        .limit(k)
    )


def approx_heavy_hitters(
    df: DataFrame, col: str, k: int = 20, max_items_tracked: int = 10000
) -> DataFrame:
    """Sketch-based top-k (Spark's approx_top_k): one pass, bounded memory
    per partition, mergeable partials — the variant that survives a
    distinct-value space too large to shuffle (URLs, n-grams at 100 TB).
    Estimates, not exact counts: pair with heavy_hitters in tests to bound
    the error."""
    return df.select(
        F.explode(
            F.expr(f"approx_top_k({col}, {int(k)}, {int(max_items_tracked)})")
        ).alias("e")
    ).select(F.col("e.item").alias("value"), F.col("e.count").alias("n"))


def iqr_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier report per group: bounds ``[q1 - k*iqr,
    q3 + k*iqr]`` from exact interpolated quartiles, plus how many rows fall
    below/above. Bounds are emitted as RAW IEEE doubles — Spark
    ``percentile`` and DuckDB ``quantile_cont`` interpolate bit-identically
    on identical inputs (verified), so boundary rows classify identically
    cross-engine; rounding the bounds would reintroduce half-up-vs-binary
    divergence.

    Plan: one partial+final aggregation for the per-group quartiles (exact
    percentiles buffer the group's values — fine for bounded group counts;
    at 100 TB swap in quantile_partials/quantile_rollup sketches), then the
    tiny bounds table broadcast-joins back onto the data for the flag pass.
    """
    q1 = F.percentile(value_col, F.lit(0.25))
    q3 = F.percentile(value_col, F.lit(0.75))
    bounds = df.groupBy(*group_cols).agg(
        (q1 - (q3 - q1) * F.lit(k)).alias("lo"),
        (q3 + (q3 - q1) * F.lit(k)).alias("hi"),
    )
    flagged = df.join(F.broadcast(bounds), group_cols)
    v = F.col(value_col)
    return flagged.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(F.when(v < F.col("lo"), 1).otherwise(0)).alias("n_low"),
        F.sum(F.when(v > F.col("hi"), 1).otherwise(0)).alias("n_high"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )


def constraint_report(df: DataFrame, constraints: dict) -> DataFrame:
    """Declarative data-quality checks: ``{name: boolean Column}`` in, one
    row per constraint out — ``(constraint_name, n_rows, n_violations)``.
    A NULL predicate counts as a violation (stricter than SQL CHECK, which
    lets NULL pass — for pipeline QA an unevaluable rule is a failure).

    ONE pass over the data: every check folds into the same partial+final
    aggregation (k conditional sums), then the single result row fans out to
    k report rows — the scan cost is that of one count(*) regardless of how
    many constraints are attached.
    """
    if not constraints:
        raise ValueError("constraint_report: no constraints given")
    names = list(constraints)
    aggs = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias(f"__v{i}")
        for i, cond in enumerate(constraints.values())
    ]
    one = df.agg(F.count("*").alias("__n"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(n).alias("constraint_name"),
                F.col(f"__v{i}").cast("long").alias("n_violations"),
            )
            for i, n in enumerate(names)
        ]
    )
    return one.select(F.col("__n").alias("n_rows"), F.explode(rows).alias("__r")).select(
        F.col("__r.constraint_name").alias("constraint_name"),
        "n_rows",
        F.col("__r.n_violations").alias("n_violations"),
    )


def fk_orphan_report(
    relations: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential integrity: for each ``(name, child, fk_col,
    parent, pk_col)`` relation, count child rows whose non-NULL foreign key
    has no matching parent — one report row per relation.

    The cross-table complement of `constraint_report` (which is single-scan,
    single-table). Per relation: distinct parent keys (partial-aggregated,
    typically tiny vs the child) left-join the child, then one conditional
    aggregation. NULL FKs follow SQL semantics — they reference nothing, so
    they are counted separately (`null_fks`), never as orphans. At 100 TB
    the child side streams through one shuffle on the FK; AQE broadcasts the
    distinct-key side whenever the parent's key set fits.
    """
    if not relations:
        raise ValueError("fk_orphan_report: no relations given")
    reports = []
    for name, child, fk_col, parent, pk_col in relations:
        keys = parent.select(F.col(pk_col).alias("__pk")).distinct()
        joined = child.select(F.col(fk_col).alias("__fk")).join(
            keys, F.col("__fk") == F.col("__pk"), "left"
        )
        reports.append(
            joined.agg(
                F.lit(name).alias("relation"),
                F.count("*").alias("child_rows"),
                F.sum(F.when(F.col("__fk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("null_fks"),
                F.sum(
                    F.when(
                        F.col("__fk").isNotNull() & F.col("__pk").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("orphans"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
