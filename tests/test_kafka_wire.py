"""Kafka wire-format round-trip WITHOUT a broker (VERDICT r01 gap #1 /
next-round #6): ConnectRecord-shaped rows are serialized to the exact column
tuple Spark's Kafka source produces (key/value binary, topic, partition,
offset, timestamp, timestampType — the record tuple at ExpandJson.java:32),
deserialized the way the Connect JsonConverter would, then expanded via
``from_connect_config`` with the reference readme's connector properties
pasted verbatim (readme.md:38-42).  Expected structs follow the reference's
own test fixtures (ExpandJsonTest.java / FIXTURES.md §A1/A3)."""

import datetime
import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_connect_expand_json_transform_spark.operators.expand_json import expand_json
from kafka_connect_expand_json_transform_spark.sources.kafka import from_connect_config

# the exact schema spark.readStream.format("kafka").load() produces
KAFKA_SOURCE_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("timestampType", IntegerType(), True),
    ]
)

SIMPLE_JSON = '{"stringValue": "String value", "numberValue": 42, "booleanValue": true}'
NESTED_JSON = (
    '{"numberValue": 42, "level1": {"level2": {"level3Number": 24, "level3String": "foo"}}}'
)

# the reference readme's connector properties, pasted verbatim (readme.md:38-42)
README_CONFIG = {
    "type": "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Value",
    "fields": "someJsonTextField,anotherJsonTextField",
    "schema.name.prefix": "com.github.joshuagrisham.kafka.test.MyJsonRecord",
}

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _wire_df(spark, value_bytes, key_bytes=None):
    """One synthetic Kafka record batch in source wire shape."""
    rows = [
        (
            key_bytes[i] if key_bytes else None,
            v,
            "my-topic",
            i % 3,
            100 + i,
            TS + datetime.timedelta(seconds=i),
            0,
        )
        for i, v in enumerate(value_bytes)
    ]
    return spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)


def test_readme_config_roundtrip_schemad_value(spark):
    """Schema'd record + fields config — the readme's exact deployment: the
    converter materializes the value struct, the SMT expands the JSON-text
    fields inside it; everything else in the record passes through."""
    outer = json.dumps(
        {
            "someJsonTextField": SIMPLE_JSON,
            "anotherJsonTextField": NESTED_JSON,
            "untouched": 7,
        }
    )
    wire = _wire_df(spark, [outer.encode("utf-8")] * 3)
    # converter step (JsonConverter role): value bytes -> typed struct with
    # the JSON-text fields still as strings
    converted = expand_json(
        wire.withColumn("value", F.col("value").cast("string")),
        source_column="value",
    )
    assert isinstance(converted.schema["value"].dataType, StructType)
    out = from_connect_config(README_CONFIG)(converted)

    vt = out.schema["value"].dataType
    some = vt["someJsonTextField"].dataType
    assert some["stringValue"].dataType == StringType()
    assert some["numberValue"].dataType == IntegerType()  # int32, KIP-301 rule
    other = vt["anotherJsonTextField"].dataType
    assert other["level1"].dataType["level2"].dataType["level3Number"].dataType == IntegerType()
    # reference's schema-name prefixing rides along (ExpandJson.java:233-245)
    assert (
        some.fields[0].metadata.get("connect.name") is None
    )  # names sit on struct-valued fields, not leaves
    named = [
        f.metadata.get("connect.name")
        for f in [vt["anotherJsonTextField"].dataType["level1"]]
    ]
    assert all(n and n.startswith("com.github.joshuagrisham.kafka.test.MyJsonRecord") for n in named)

    row = out.select(
        "value.someJsonTextField.stringValue",
        "value.someJsonTextField.numberValue",
        "value.someJsonTextField.booleanValue",
        "value.anotherJsonTextField.level1.level2.level3Number",
        "value.anotherJsonTextField.level1.level2.level3String",
        "value.untouched",
        "topic",
        "partition",
        "offset",
        "timestamp",
    ).first()
    assert row[0:3] == ("String value", 42, True)  # ExpandJsonTest.java simple fixture
    assert row[3:5] == (24, "foo")                 # nested fixture
    assert row[5] == 7                             # non-expanded field untouched
    assert row[6] == "my-topic" and row[7] == 0 and row[8] == 100 and row[9] == TS


def test_schemaless_value_whole_expansion(spark):
    """Schemaless record (no fields config): the whole value is JSON text and
    is replaced by its typed expansion (ExpandJson.java:94-104)."""
    wire = _wire_df(spark, [b'{"k": 1, "name": "a"}', b'{"k": 2, "name": "b"}'])
    converted = wire.withColumn("value", F.col("value").cast("string"))
    out = from_connect_config(
        {"type": "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Value"}
    )(converted)
    assert isinstance(out.schema["value"].dataType, StructType)
    got = {r["k"]: r["name"] for r in out.select("value.k", "value.name").collect()}
    assert got == {1: "a", 2: "b"}
    # record plumbing intact
    assert out.select("topic").first()[0] == "my-topic"


def test_key_side_expansion(spark):
    """ExpandJson$Key (ExpandJson.java:277-297): the key side expands, the
    value side and record columns pass through byte-identical."""
    wire = _wire_df(
        spark,
        [b"opaque-value-bytes"] * 2,
        key_bytes=[b'{"id": 5}', b'{"id": 6}'],
    )
    converted = wire.withColumn("key", F.col("key").cast("string"))
    out = from_connect_config(
        {"type": "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Key"}
    )(converted)
    assert isinstance(out.schema["key"].dataType, StructType)
    assert sorted(r[0] for r in out.select("key.id").collect()) == [5, 6]
    assert bytes(out.select("value").first()[0]) == b"opaque-value-bytes"


def test_connect_config_guards(spark):
    """Both DataException guards (ExpandJson.java:95-98, 107-110) fire at
    plan time."""
    wire = _wire_df(spark, [b'{"k": 1}'])
    schemaless = wire.withColumn("value", F.col("value").cast("string"))
    with pytest.raises(ValueError, match="no schema"):
        from_connect_config(dict(README_CONFIG))(schemaless)
    structed = expand_json(schemaless, source_column="value")
    with pytest.raises(ValueError, match="'fields' is empty"):
        from_connect_config(
            {"type": "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Value"}
        )(structed)


def test_key_side_field_mode(spark):
    """ExpandJson$Key WITH a fields config: JSON-text fields inside a
    schema'd KEY struct expand in place; the value side passes through
    (the fourth quadrant of the reference's mode matrix — Key x schema'd)."""
    key_obj = json.dumps({"meta": NESTED_JSON, "plain": 1})
    wire = _wire_df(spark, [b"payload"] * 2, key_bytes=[key_obj.encode()] * 2)
    converted = expand_json(
        wire.withColumn("key", F.col("key").cast("string")), source_column="key"
    )
    out = from_connect_config(
        {
            "type": "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Key",
            "fields": "meta",
            "schema.name.prefix": "test.KeyRecord",
        }
    )(converted)
    kt = out.schema["key"].dataType
    meta_t = kt["meta"].dataType
    assert meta_t["numberValue"].dataType == IntegerType()
    # generated names ride on struct-valued fields INSIDE the expansion; the
    # expanded leaf's own root name has no containing field in the nested
    # path (withField carries no metadata) — documented metadata-only limit
    assert meta_t["level1"].metadata.get("connect.name", "").startswith("test.KeyRecord")
    row = out.select(
        "key.meta.level1.level2.level3Number", "key.plain", "value"
    ).first()
    assert row[0] == 24 and row[1] == 1
    assert bytes(row[2]) == b"payload"


def test_confluent_wire_format_golden_bytes_and_failfast():
    """Confluent Schema Registry framing (public spec): magic byte 0x00 +
    4-byte big-endian schema id + bare Avro datum.  Golden bytes pin the
    zigzag varint encoding; a bad magic byte and an unregistered schema id
    must fail fast like a real deserializer."""
    import pandas as pd
    import pytest as _pytest

    from kafka_connect_expand_json_transform_spark.sources.kafka import (
        confluent_frame_udf,
        confluent_unframe_udf,
    )

    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "uid", "type": "int"},
            {"name": "k", "type": "int"},
            {"name": "tag", "type": "string"},
        ],
    }
    pdf = pd.DataFrame({"uid": [3, 49], "k": [7, 99], "tag": ["t0", "t6"]})
    framed = pd.concat(list(confluent_frame_udf(42, schema)([pdf])))
    w0 = bytes(framed["wire"].iloc[0])
    assert w0[0] == 0 and int.from_bytes(w0[1:5], "big") == 42
    # datum for row 0: zigzag(3)=6, zigzag(7)=14, 't0' = len-zigzag(2)=4 + utf8
    assert w0[5:] == bytes([6, 14, 4]) + b"t0"
    back = pd.concat(list(confluent_unframe_udf({42: schema})([framed])))
    assert back.to_dict("records") == pdf.to_dict("records")
    with _pytest.raises(KeyError):
        list(confluent_unframe_udf({99: schema})([framed]))
    bad = pd.DataFrame({"wire": [b"\x01" + w0[1:]]})
    with _pytest.raises(ValueError):
        list(confluent_unframe_udf({42: schema})([bad]))
