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


# ---------------------------------------------------------------------------
# Mergeable quantile sketches (equi-weight centroid compression, t-digest-lite)
#
# Spark exposes mergeable DISTINCT sketches (HLL above) but no mergeable
# QUANTILE partial as a column (percentile_approx merges internally only).
# At 100 TB "p99 per key per day, rolled up weekly" cannot re-scan the raw
# data per rollup — it needs persisted kilobyte partials, like HLL.  This is
# the standard two-level design: a map-side pass compresses each Arrow batch
# to <= m weighted centroids (no shuffle of raw values), a reduce-side merge
# concatenates and re-compresses centroid sets.  Max rank error ~ 1/m per
# compression level (2 levels here); estimates are deterministic for a fixed
# partitioning but, like any sketch, depend on merge order — queries over
# them are rows-only for the oracle, with an accuracy-bound test instead.
# ---------------------------------------------------------------------------


def _compress(means, weights, m):
    """Deterministic equi-weight recompression of sorted weighted centroids
    to <= m buckets (weighted mean per bucket)."""
    import numpy as np

    if len(means) <= m:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights)
    total = cum[-1]
    # bucket of each centroid: floor(m * (cum_before) / total)
    bucket = np.minimum((m * (cum - weights) / total).astype("int64"), m - 1)
    w_out = np.bincount(bucket, weights=weights, minlength=m)
    s_out = np.bincount(bucket, weights=means * weights, minlength=m)
    keep = w_out > 0
    return s_out[keep] / w_out[keep], w_out[keep]


def quantile_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 256,
) -> DataFrame:
    """Map-side pass: per Arrow batch, per group, compress values to <= m
    weighted centroids. Output rows: group cols + ``q_means``/``q_weights``
    arrays + ``q_count`` — kilobytes per (partition, group), ready to persist
    or merge. No shuffle happens here."""
    import pandas as pd

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*group_cols).schema.fields
    )
    schema = f"{out_fields}, q_means array<double>, q_weights array<double>, q_count long"

    def sketch_batches(batches):
        import numpy as np

        for pdf in batches:
            vals = pd.to_numeric(pdf[value_col], errors="coerce")
            pdf = pdf.assign(__v=vals).dropna(subset=["__v"])
            if pdf.empty:
                continue
            rows = []
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                v = g["__v"].to_numpy("float64")
                mu, w = _compress(v, np.ones_like(v), m)
                rows.append((*key, list(mu), list(w), int(len(v))))
            yield pd.DataFrame(
                rows, columns=[*group_cols, "q_means", "q_weights", "q_count"]
            )

    return df.select(*group_cols, value_col).mapInPandas(sketch_batches, schema)


def quantile_rollup(
    partials: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    m: int = 256,
) -> DataFrame:
    """Reduce-side merge to a coarser grouping + quantile estimates.  The
    shuffle moves only centroid arrays (<= m doubles per input partial).
    Output: one row per group with ``q_count`` and one ``p{q}`` column per
    requested quantile (weighted-CDF linear interpolation)."""
    import pandas as pd

    gschema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in partials.select(*group_cols).schema.fields
    )
    qcols = [f"p{str(q).replace('0.', '').ljust(2, '0')}" for q in quantiles]
    schema = f"{gschema}, q_count long, " + ", ".join(f"{c} double" for c in qcols)

    def merge(key, pdf):
        import numpy as np

        means = np.concatenate([np.asarray(a, "float64") for a in pdf["q_means"]])
        weights = np.concatenate([np.asarray(a, "float64") for a in pdf["q_weights"]])
        mu, w = _compress(means, weights, m)
        order = np.argsort(mu, kind="stable")
        mu, w = mu[order], w[order]
        cdf = np.cumsum(w) - w / 2.0  # centroid sits at its weight's midpoint
        total = w.sum()
        ests = [float(np.interp(q * total, cdf, mu)) for q in quantiles]
        return pd.DataFrame([[*key, int(pdf["q_count"].sum()), *ests]],
                            columns=[*group_cols, "q_count", *qcols])

    return partials.groupBy(*group_cols).applyInPandas(merge, schema)


def incremental_quantile(
    stream_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    partials_path: str,
    checkpoint_location: str,
    m: int = 256,
):
    """Maintain per-group quantile-sketch partials incrementally from a
    stream — the quantile twin of ``incremental_hll``: each micro-batch is
    compressed to centroids and merge-compressed into a persisted partials
    table, so "p99 so far" reads kilobytes instead of replaying history.
    Same localCheckpoint-before-overwrite discipline as incremental_hll.
    """
    import pandas as pd

    from kafka_connect_expand_json_transform_spark.streaming.sources import (
        foreach_batch_sink,
    )

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = quantile_partials(batch_df, group_cols, value_col, m)
        try:
            old = spark.read.parquet(partials_path)
            combined = old.unionByName(new)
        except Exception:  # first batch: no partials yet
            combined = new

        gschema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in combined.select(*group_cols).schema.fields
        )
        schema = f"{gschema}, q_means array<double>, q_weights array<double>, q_count long"

        def remerge(key, pdf):
            import numpy as np

            means = np.concatenate([np.asarray(a, "float64") for a in pdf["q_means"]])
            weights = np.concatenate([np.asarray(a, "float64") for a in pdf["q_weights"]])
            mu, w = _compress(means, weights, m)
            return pd.DataFrame(
                [[*key, list(mu), list(w), int(pdf["q_count"].sum())]],
                columns=[*group_cols, "q_means", "q_weights", "q_count"],
            )

        merged = combined.groupBy(*group_cols).applyInPandas(remerge, schema)
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(partials_path)

    return foreach_batch_sink(stream_df, update, checkpoint_location)
