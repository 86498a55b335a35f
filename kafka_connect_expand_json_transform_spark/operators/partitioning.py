"""Scale-adaptive parallelism floor for heavy narrow compute.

The driver's tables are single-file, single-row-group parquet: Spark cannot
split one row group across tasks, so every scan plans exactly ONE partition
regardless of ``spark.sql.files.maxPartitionBytes`` / ``minPartitionNum``.
Any expensive narrow stage stacked on such a scan (MinHash's 16 hashes per
shingle, SimHash's vote kernel, regex tokenization) then runs on one core of
the whole cluster — the "one huge unsplittable file" input-skew case of the
optimization guide (§2.5), whose standard fix is to repartition immediately
after the read.

``fan_out`` applies that fix *adaptively*: it round-robin repartitions only
when the plan currently yields fewer partitions than the cluster's default
parallelism.  At real scale (100 TB = many files / many row groups) the scan
already has far more partitions than cores and this is a provable no-op — no
exchange is added to the plan at all.  When it does fire, the shuffled bytes
are by construction the contents of too-few-to-parallelize partitions, so the
exchange is cheap relative to the narrow work it unlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_partitions`` (default: the cluster's
    ``defaultParallelism``) partitions before an expensive narrow stage.

    Returns ``df`` untouched when the partition count is already at or above
    the floor — callers can apply it unconditionally; only under-parallel
    plans pay the one round-robin exchange.  Row values are unchanged (only
    placement moves), so any order-insensitive downstream is unaffected.

    CALLER CONTRACT (ADVICE r10): apply this directly on SCAN-ROOTED or
    narrow plans (scan + project/filter/generate) or on already-
    materialized frames (``localCheckpoint`` output).  On a plan that
    contains exchanges, ``.rdd`` below finalizes the physical plan and —
    with AQE enabled — eagerly EXECUTES the shuffle query stages at
    plan-build time (a real job, not just planning); and on tiny
    per-micro-batch frames the probe + extra exchange is a measured net
    loss — gate it off there (``minhash_signatures(parallelize=False)``
    is that gate for the dedup family).
    """
    sc = df.sparkSession.sparkContext
    want = min_partitions or sc.defaultParallelism
    # getNumPartitions plans the RDD lineage; launches no job for the
    # narrow plans the caller contract requires (see above for why an
    # exchange-bearing plan would behave differently under AQE)
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
