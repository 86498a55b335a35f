"""Kafka stream source/sink wiring — [REF]: the reference runs inside a Kafka
Connect pipeline (readme.md:38-42 connector config; record tuple at
ExpandJson.java:32).  Spark's Kafka source exposes the same record tuple as
columns: key, value (binary), topic, partition, offset, timestamp.

No broker exists in the test container, so these builders are exercised by
unit tests only up to plan construction; streaming semantics are tested
against memory/rate sources (see streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    cast_strings: bool = True,
    options: dict | None = None,
) -> DataFrame:
    """ConnectRecord-equivalent streaming source (ExpandJson.java:32 tuple)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    if cast_strings:
        # JSON payloads arrive as UTF-8 bytes; expand_json casts anyway, but
        # exposing string columns mirrors the SMT's String-typed fields
        df = df.withColumn("key", df["key"].cast("string")).withColumn(
            "value", df["value"].cast("string")
        )
    return df


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "append",
    trigger: dict | None = None,
):
    """Kafka sink — the SMT's output path back into the Connect pipeline
    (ExpandJson.java:103,128). Expects ``key``/``value`` columns."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
