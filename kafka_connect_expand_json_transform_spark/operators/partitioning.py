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
    """
    sc = df.sparkSession.sparkContext
    want = min_partitions or sc.defaultParallelism
    # getNumPartitions plans the RDD lineage but launches no job
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
