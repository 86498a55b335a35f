"""Broker-free streaming sources/sinks for tests and local runs.

The reference's host runtime (Kafka Connect) owns transport; our Kafka wiring
lives in ``sources.kafka``. No broker exists in the test container, so
deterministic streaming tests run file sources with ``availableNow`` triggers
into the memory sink (SURVEY.md §5 strategy (3)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "json",
    options: dict | None = None,
) -> DataFrame:
    """Streaming file source. Schema is mandatory: streaming readers cannot
    infer (there is no data yet at plan time)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def rate_source(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int | None = None
) -> DataFrame:
    """Synthetic ``(timestamp, value)`` stream for load/latency tests."""
    reader = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()


def memory_sink(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """Run the stream into an in-memory table ``name`` (query it with
    ``spark.table(name)``). ``available_now=True`` processes everything
    currently available then stops — the deterministic test trigger."""
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_sink(
    df: DataFrame,
    func,
    checkpoint_location: str,
    available_now: bool = True,
) -> StreamingQuery:
    """``foreachBatch`` escape hatch: each micro-batch arrives as a *batch*
    DataFrame, so any batch-only operator (MERGE, complex joins, multi-sink
    fan-out) can run per batch with exactly-once bookkeeping via the
    checkpoint."""
    writer = df.writeStream.foreachBatch(func).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
