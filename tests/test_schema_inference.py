"""Golden tests for the KIP-301-style inference rules (SURVEY.md §1.3,
FIXTURES.md §A1/A3/A6; reference rule source ExpandJson.java:191-258)."""

import json

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_connect_expand_json_transform_spark.schema_inference import (
    assign_schema_names,
    infer_schema_for_json,
    infer_schema_from_samples,
)

SIMPLE_JSON = '{"stringValue": "String value", "numberValue": 42, "booleanValue": true}'
NESTED_JSON = (
    '{"numberValue": 42, "level1": {"level2": {"level3Number": 24, "level3String": "foo"}}}'
)


def st(*fields):
    return StructType([StructField(n, t, True) for n, t in fields])


def test_simple_json():  # FIXTURES.md A1 (ExpandJsonTest.java:25-31)
    assert infer_schema_for_json(SIMPLE_JSON) == st(
        ("stringValue", StringType()),
        ("numberValue", IntegerType()),  # int32, not Spark's default int64
        ("booleanValue", BooleanType()),
    )


def test_nested_json():  # FIXTURES.md A3 (ExpandJsonTest.java:59)
    assert infer_schema_for_json(NESTED_JSON) == st(
        ("numberValue", IntegerType()),
        (
            "level1",
            st(("level2", st(("level3Number", IntegerType()), ("level3String", StringType())))),
        ),
    )


def test_scalars():  # FIXTURES.md A4/A6
    assert infer_schema_for_json("null") == StringType()
    assert infer_schema_for_json("true") == BooleanType()
    assert infer_schema_for_json("42") == IntegerType()
    assert infer_schema_for_json(str(2**31)) == LongType()  # > int32
    assert infer_schema_for_json("12345678901") == LongType()
    assert infer_schema_for_json(str(2**64)) == StringType()  # BigInteger
    assert infer_schema_for_json("1.5") == DoubleType()
    assert infer_schema_for_json('"key"') == StringType()


def test_arrays():
    assert infer_schema_for_json("[]") == ArrayType(StringType(), True)
    assert infer_schema_for_json("[1, 2]") == ArrayType(IntegerType(), True)
    # first-element-only rule (ExpandJson.java:222)
    assert infer_schema_for_json('[1, "a"]') == ArrayType(IntegerType(), True)
    assert infer_schema_for_json('["a", 1]') == ArrayType(StringType(), True)
    assert infer_schema_for_json('[{"a": 1}]') == ArrayType(st(("a", IntegerType())), True)


def test_field_order_preserved():  # JSON key order == struct field order
    sch = infer_schema_for_json('{"z": 1, "a": 2, "m": 3}')
    assert [f.name for f in sch.fields] == ["z", "a", "m"]


def test_merge_across_samples():
    sch = infer_schema_from_samples(['{"a": 1}', '{"a": 2.5, "b": null}', '{"b": "x"}'])
    assert sch == st(("a", DoubleType()), ("b", StringType()))
    # null-only field finalizes to string
    assert infer_schema_from_samples(['{"a": null}']) == st(("a", StringType()))
    # int widens to long
    assert infer_schema_from_samples(['{"a": 1}', '{"a": 12345678901}']) == st(
        ("a", LongType())
    )
    # irreconcilable -> string (the reference's catch-all)
    assert infer_schema_from_samples(['{"a": 1}', '{"a": [1]}']) == st(("a", StringType()))
    # malformed samples skipped
    assert infer_schema_from_samples(["{bad", '{"a": true}']) == st(("a", BooleanType()))


def test_schema_name_prefix():  # ExpandJson.java:69-71, 233-245
    sch = infer_schema_for_json(NESTED_JSON)
    named = assign_schema_names(sch, "my.prefix.MyConnectRecord")
    level1 = named["level1"]
    level2 = level1.dataType["level2"]
    # bottom-up: innermost distinct struct gets the bare prefix
    assert level2.metadata["connect.name"] == "my.prefix.MyConnectRecord"
    assert level1.metadata["connect.name"] == "my.prefix.MyConnectRecord2"


def test_inferred_schema_reparses_own_document():
    # property: a document always fits its own inferred schema (sanity for
    # PERMISSIVE parsing downstream)
    for doc in [SIMPLE_JSON, NESTED_JSON, '{"a": [1, 2, 3], "b": {"c": null}}']:
        sch = infer_schema_for_json(doc)
        assert sch is not None
        json.loads(doc)  # well-formed by construction
