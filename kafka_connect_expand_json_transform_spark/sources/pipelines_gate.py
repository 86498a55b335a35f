"""Spark Declarative Pipelines (Spark 4.1 `pyspark.pipelines`) — [EXT]
gated like Avro/Protobuf (sources/avro.py, sources/protobuf.py).

SDP (the open-sourced Delta Live Tables model: ``@dp.materialized_view`` /
``@dp.table`` / ``@dp.create_streaming_table`` + flows, resolved into a
dataflow graph the server runs incrementally) is CLIENT-ONLY over Spark
Connect: registering a graph needs a Connect session (``spark.client``),
which needs ``grpcio`` — not shipped in this container.  The probe reports
that honestly; pipelines here are instead declared through the library's
query registry (``plans/queries.py``) and Structured Streaming
``foreachBatch`` loops (e.g. ``stream_txlog_ingest_maintenance_e2e``),
which express the same ingest-transform-maintain graphs imperatively.

On a cluster with ``pip install "pyspark[connect]"`` the same probe turns
true and ``pyspark.pipelines`` decorators work against
``SparkSession.builder.remote(...)`` sessions.
"""

from __future__ import annotations


class PipelinesNotAvailable(RuntimeError):
    """Spark Declarative Pipelines need a Spark Connect session (grpcio)."""


def declarative_pipelines_available() -> bool:
    """True when the SDP client stack (pyspark.pipelines + grpcio) is
    importable — the minimum for registering a dataflow graph."""
    try:
        import grpc  # noqa: F401
        import pyspark.pipelines  # noqa: F401

        return True
    except Exception:
        return False


def require_declarative_pipelines() -> None:
    """Raise the actionable error when SDP cannot run here."""
    if not declarative_pipelines_available():
        raise PipelinesNotAvailable(
            "Spark Declarative Pipelines need the Spark Connect client: "
            'pip install "pyspark[connect]" and connect with '
            "SparkSession.builder.remote(...)"
        )
