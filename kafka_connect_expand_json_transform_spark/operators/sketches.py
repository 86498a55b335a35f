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


def incremental_hll(
    stream_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    partials_path: str,
    checkpoint_location: str,
    lgk: int = 12,
):
    """Maintain per-group HLL partials incrementally from a stream: each
    micro-batch is sketched and union-merged into a persisted partials table
    (the continuously-updated "distinct users per key" dashboard feed).

    The merge reads kilobytes of sketches, never reprocesses history;
    exactly-once bookkeeping comes from the foreachBatch checkpoint.  The
    merged frame is localCheckpoint'ed (lineage truncated, not just cached)
    before the overwrite — a cached-only plan could re-read the path it is
    about to delete if a partition were evicted.
    """
    from kafka_connect_expand_json_transform_spark.streaming.sources import (
        foreach_batch_sink,
    )

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = hll_partials(batch_df, group_cols, value_col, lgk)
        try:
            old = spark.read.parquet(partials_path)
            merged = (
                old.unionByName(new)
                .groupBy(*group_cols)
                .agg(F.hll_union_agg("hll").alias("hll"))
            )
        except Exception:  # first batch: no partials yet
            merged = new
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(partials_path)

    return foreach_batch_sink(stream_df, update, checkpoint_location)
