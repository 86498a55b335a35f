"""Custom pure-Python DataSource — [EXT] (SURVEY §2.2 sources).

The reference lives inside Kafka Connect, a CONNECTOR FRAMEWORK: its users
write sources/sinks as plugins (readme.md:16, pom.xml connect-api dep).
Spark 4's Python DataSource API is the Spark-native analogue — a connector
written in pure Python, registered by name, readable as batch or stream.
This module ships one: ``connect_records``, a deterministic generator of
ConnectRecord-shaped tuples (topic / partition / offset / key / value —
ExpandJson.java:32) whose JSON value payloads feed ``expand_json`` exactly
like a real topic would, without a broker.

Determinism is the point: record ``i`` is a pure function of ``i``, so the
same frame is reproducible in ANSI SQL (``generate_series``) and the whole
custom-connector path gets a DuckDB oracle (`custom_datasource_expand`).

Scale notes: ``partitions()`` splits the offset range into
``numPartitions`` independent slices — each executor generates its slice
locally (no driver materialization, no shuffle), which is the same
contract a real partition-parallel connector (JDBC ranges, Kafka topic
partitions, object-store listings) satisfies.  The streaming reader hands
out micro-batch offset ranges the same way.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

RECORD_SCHEMA = (
    "topic string, partition int, offset bigint, key string, value string"
)


def record_at(i: int, topic: str, num_partitions: int) -> tuple:
    """Record ``i`` as a pure function of ``i`` — the reproducibility
    contract shared with the SQL oracle (generate_series arithmetic)."""
    return (
        topic,
        i % num_partitions,
        i,
        json.dumps({"uid": i % 50}, separators=(",", ":")),
        json.dumps({"k": i % 100, "tag": f"t{i % 7}"}, separators=(",", ":")),
    )


@dataclass
class _Slice(InputPartition):
    start: int
    end: int


class ConnectRecordsDataSource(DataSource):
    """``spark.read.format("connect_records").option("rows", n)`` after
    ``spark.dataSource.register(ConnectRecordsDataSource)``.

    Options: ``rows`` (total records, default 1000), ``topic`` (default
    "synthetic"), ``numPartitions`` (parallel slices, default 8),
    ``rowsPerBatch`` (streaming: records admitted per micro-batch).
    """

    @classmethod
    def name(cls) -> str:
        return "connect_records"

    def schema(self) -> str:
        return RECORD_SCHEMA

    def reader(self, schema: StructType) -> "ConnectRecordsReader":
        return ConnectRecordsReader(self.options)

    def streamReader(self, schema: StructType) -> "ConnectRecordsStreamReader":
        return ConnectRecordsStreamReader(self.options)


class ConnectRecordsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.topic = options.get("topic", "synthetic")
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self):
        per = max(1, -(-self.rows // self.num_partitions))
        return [
            _Slice(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield record_at(i, self.topic, self.num_partitions)


class ConnectRecordsStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same deterministic record space.

    The offset contract: ``latestOffset()`` advances a driver-side cursor by
    at most ``rowsPerBatch`` per trigger (the admission control knob —
    truncating inside ``partitions()`` instead would desync the committed
    offset from the rows actually read), and ``partitions(start, end)``
    returns the full admitted range.  Python stream readers don't support
    ``availableNow`` (Spark falls back to a single batch); drive with a
    normal trigger and stop when ``offset`` reaches ``rows``.
    """

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.topic = options.get("topic", "synthetic")
        self.num_partitions = int(options.get("numpartitions", 8))
        self.rows_per_batch = int(options.get("rowsperbatch", 250))
        self._cursor = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._cursor = min(self._cursor + self.rows_per_batch, self.rows)
        return {"offset": self._cursor}

    def partitions(self, start: dict, end: dict):
        return [_Slice(int(start["offset"]), int(end["offset"]))]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield record_at(i, self.topic, self.num_partitions)

    def commit(self, end: dict) -> None:
        pass  # stateless generator: nothing to clean up

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration of the connector with a SparkSession."""
    spark.dataSource.register(ConnectRecordsDataSource)
