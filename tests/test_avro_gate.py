"""Avro capability gate: the probe reports absence honestly and
expand_avro degrades to an actionable error instead of a Py4J stack;
when the external module IS present the same call sites work."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.sources import avro as A


def test_probe_and_gated_error_or_roundtrip(spark):
    df = spark.range(3).select(F.col("id"))
    if not A.avro_available(spark):
        with pytest.raises(A.AvroNotLoaded, match="--packages"):
            A.expand_avro(
                df.select(F.lit(b"\x00").alias("id")),
                "id",
                '{"type": "long"}',
            )
        pytest.skip("spark-avro external module absent from this container")
    # module present: serialize -> parse round trip is the identity
    ser = df.select(A.to_avro_column("id").alias("b"))
    back = A.expand_avro(ser, "b", '{"type": "long"}')
    assert [r["b"] for r in back.collect()] == [0, 1, 2]


def test_probe_is_cached_per_session(spark):
    first = A.avro_available(spark)
    assert A.avro_available(spark) is first
