"""Sketch-based distinct counting — [EXT] (SURVEY.md §2.2 aggregation row;
the reference has no aggregations at all, ExpandJson.java is a stateless
per-record transform).

The 100 TB pattern this module exists for: **pre-aggregate mergeable sketch
partials** (per day / per source / per partition) once, persist them, and
answer any later rollup by merging kilobyte-sized sketches instead of
re-scanning the corpus.  Spark 4's Datasketches HLL functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) make the
partials first-class binary columns, so the merge step is an ordinary
aggregation over tiny data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col`` (binary column,
    ~2^lgk bytes).  This is the expensive pass — one scan, partial+final
    hash aggregation — whose output is small enough to persist and re-merge
    forever after."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col)
    )


def hll_rollup(
    partials: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Merge sketch partials up to a coarser grouping and estimate.  Runs on
    sketch-sized data (bytes per group), never on the raw corpus."""
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(estimate_col)
    )


def distinct_estimate_report(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Fine-grained sketch pass + coarse rollup in one call — the shape a
    scheduled pipeline would run incrementally (sketch new partitions, merge
    with the historical partials)."""
    return hll_rollup(hll_partials(df, fine_cols, value_col, lgk), coarse_cols)
