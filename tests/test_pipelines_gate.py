"""Spark Declarative Pipelines capability gate: honest absence report
(grpcio/Connect not in this container) and, when present, the decorator
surface imports and registers."""

import pytest

from kafka_connect_expand_json_transform_spark.sources import pipelines_gate as P


def test_probe_and_gated_error_or_decorators():
    if not P.declarative_pipelines_available():
        with pytest.raises(P.PipelinesNotAvailable, match="pyspark\\[connect\\]"):
            P.require_declarative_pipelines()
        pytest.skip("Spark Connect client (grpcio) absent from this container")
    # stack present: the SDP decorator surface is importable and callable
    import pyspark.pipelines as dp

    assert callable(dp.materialized_view) and callable(dp.table)
    P.require_declarative_pipelines()  # no raise
