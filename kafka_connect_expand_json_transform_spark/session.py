"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the configuration is chosen so the same plans
scale to a multi-executor cluster: AQE on (runtime re-plan, skew-join
handling), adaptive shuffle-partition coalescing, Arrow for any pandas
interchange, and a UTC session timezone so timestamp semantics are
cluster-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kafka-connect-expand-json-transform-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # this is what turns a static 200-partition plan into one sized to the
        # actual shuffle output.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow makes every pandas_udf / applyInPandas exchange columnar.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Keep timestamps as TIMESTAMP (not TIMESTAMP_NTZ surprises) and
        # parquet pushdown on (default, but pinned because the bench depends
        # on it).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # the driver's events.parquet stores TIMESTAMP(NANOS); read as long
        # and convert in sources.batch.load_table (DuckDB-identical values)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # naive parquet timestamps read as TIMESTAMP (LTZ, =UTC wall clock
        # here) at the scan so date predicates stay pushdown-eligible;
        # sources.batch.load_table re-asserts this for harness-owned
        # sessions that never went through get_spark
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # allow custom Python DataSources (sources/python_datasource.py) to
        # receive pushed-down filters — off by default in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # local[N] packs driver + N executor threads into ONE JVM; the 1g
        # default heap starves 32 concurrent sort/join buffers long before
        # any real executor would (only effective for the process's first
        # session — later getOrCreate calls reuse the running JVM)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def register_testdata(spark: SparkSession, sf_dir: str):
    """Register the driver's parquet tables as temp views (TESTDATA.md)."""
    from kafka_connect_expand_json_transform_spark.sources.batch import (
        register_testdata as _register,
    )

    return _register(spark, sf_dir)
