"""Variant-path tests (SURVEY.md §1.5 'variant' strategy surface)."""

from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.functions import variant as V
from kafka_connect_expand_json_transform_spark.operators.expand_json import expand_json


def test_variant_get_typed_and_permissive(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": "x"}}',), ('{"a": "not-int"}',)], "j string"
    )
    v = df.select(V.to_variant("j").alias("v"))
    rows = v.select(
        V.try_variant_get("v", "$.a", "int").alias("a"),
        V.try_variant_get("v", "$.b.c", "string").alias("c"),
    ).collect()
    assert [(r["a"], r["c"]) for r in rows] == [(1, "x"), (None, None)]


def test_variant_schema_per_record_and_agg(spark):
    df = spark.createDataFrame([('{"a": 1}',), ('{"a": "s", "b": true}',)], "j string")
    per = df.select(V.variant_schema(V.to_variant("j")).alias("s")).collect()
    assert per[0]["s"] == "OBJECT<a: BIGINT>"
    assert per[1]["s"] == "OBJECT<a: STRING, b: BOOLEAN>"
    merged = V.variant_schema_agg(df, "j")
    # distributed merge widens conflicting a to VARIANT, keeps b
    assert "b: BOOLEAN" in merged


def test_expand_json_variant_roundtrip(spark):
    df = spark.createDataFrame([('{"k": 7}',)], "props string")
    out = expand_json(df, source_column="props", infer="variant")
    got = out.select(V.try_variant_get("props", "$.k", "int").alias("k")).first()
    assert got["k"] == 7
