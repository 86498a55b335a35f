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


# ---------------------------------------------------------------------------
# BigDecimal / BigInteger fidelity goldens (FIXTURES.md A6;
# ExpandJson.java:201-216 — isBigInteger -> string, isBigDecimal -> string)
# ---------------------------------------------------------------------------

HIGH_PRECISION = "3.141592653589793238462643383279502884197"


def test_biginteger_boundary_sweep():
    """ExpandJson.java:201-209: int if it fits 32 bits, bigint if 64, string
    beyond — exact boundaries at 2^31 +/- 1 and 2^63 +/- 1."""
    cases = {
        2**31 - 1: IntegerType(),
        2**31: LongType(),
        2**31 + 1: LongType(),
        -(2**31): IntegerType(),
        -(2**31) - 1: LongType(),
        2**63 - 1: LongType(),
        2**63: StringType(),       # BigInteger -> string (ExpandJson.java:201-202)
        2**63 + 1: StringType(),
        -(2**63): LongType(),
        -(2**63) - 1: StringType(),
        99999999999999999999: StringType(),  # FIXTURES.md A6 golden
    }
    for value, expected in cases.items():
        got = infer_schema_for_json(f'{{"a": {value}}}')
        assert got == st(("a", expected)), (value, got)


def test_bigdecimal_fidelity_mode():
    """ExpandJson.java:212-213: a BigDecimal float node -> string.  Only
    fires under decimal_fidelity=True — Jackson's default readTree yields
    DoubleNode (so double), which is also this module's default."""
    doc = f'{{"pi": {HIGH_PRECISION}, "plain": 2.5}}'
    assert infer_schema_for_json(doc) == st(
        ("pi", DoubleType()), ("plain", DoubleType())
    )
    assert infer_schema_for_json(doc, decimal_fidelity=True) == st(
        ("pi", StringType()), ("plain", StringType())
    )
    # sample-merge path honors the same flag
    assert infer_schema_from_samples([doc], decimal_fidelity=True) == st(
        ("pi", StringType()), ("plain", StringType())
    )
    # bare-scalar BigDecimal (whole-value mode expands scalars too)
    assert infer_schema_for_json(HIGH_PRECISION, decimal_fidelity=True) == StringType()
    assert infer_schema_for_json(HIGH_PRECISION) == DoubleType()


def test_bigdecimal_fidelity_end_to_end(spark):
    """Decimal text survives expansion digit-for-digit when the field lands in
    a string column: the decimal-derived leaves are re-extracted through
    VariantType, exact up to 38 digits (decimal128 — the documented bound;
    the reference's BigDecimal is unbounded)."""
    from kafka_connect_expand_json_transform_spark.operators.expand_json import (
        expand_json,
    )

    exact29 = "1.2345678901234567890123456789"  # 29 digits: inside the bound
    df = spark.createDataFrame(
        [(f'{{"pi": {exact29}, "small": 3.14, "nested": {{"d": {exact29}}}}}',)],
        "payload string",
    )
    out = expand_json(df, fields=["payload"], decimal_fidelity=True)
    ptype = out.schema["payload"].dataType
    assert ptype["pi"].dataType == StringType()
    assert ptype["small"].dataType == StringType()
    assert ptype["nested"].dataType["d"].dataType == StringType()
    row = out.select("payload.pi", "payload.small", "payload.nested.d").first()
    assert row[0] == exact29          # every digit kept
    assert row[1] == "3.14"           # scale kept, no trailing-zero padding
    assert row[2] == exact29          # nested path kept too
    # without fidelity the same text rounds through a double
    lossy = expand_json(df, fields=["payload"])
    assert lossy.schema["payload"].dataType["pi"].dataType == DoubleType()
    assert lossy.select("payload.pi").first()[0] == float(exact29)
    # beyond 38 digits Variant itself holds a double — schema stays string,
    # value is the double's shortest round-trip text (documented divergence
    # from the reference's unbounded BigDecimal)
    wide = spark.createDataFrame([(f'{{"x": {HIGH_PRECISION}}}',)], "payload string")
    wout = expand_json(wide, fields=["payload"], decimal_fidelity=True)
    assert wout.schema["payload"].dataType["x"].dataType == StringType()
    assert wout.select("payload.x").first()[0] == str(float(HIGH_PRECISION))


def test_root_schema_name_on_expanded_column(spark):
    """The root struct's generated name (numbered AFTER its children —
    reference bottom-up order, ExpandJson.java:233-245) rides as column
    metadata on top-level expanded columns."""
    from kafka_connect_expand_json_transform_spark.operators.expand_json import (
        expand_json,
    )

    df = spark.createDataFrame([(NESTED_JSON,)], "payload string")
    out = expand_json(df, fields=["payload"], schema_name_prefix="p.Rec")
    field = out.schema["payload"]
    # bottom-up: level2 -> p.Rec, level1 -> p.Rec2, root -> p.Rec3
    assert field.dataType["level1"].dataType["level2"].dataType is not None
    lvl1 = field.dataType["level1"]
    assert lvl1.dataType["level2"].metadata["connect.name"] == "p.Rec"
    assert lvl1.metadata["connect.name"] == "p.Rec2"
    assert field.metadata["connect.name"] == "p.Rec3"


def test_schema_names_shared_across_fields(spark):
    """The reference's generatedSchemaNames/schemaNameIndex are INSTANCE
    fields shared across all configured fields (ExpandJson.java:69-71,
    238): with fields=[a,b], field b's structs continue numbering from —
    and dedup against — field a's."""
    from kafka_connect_expand_json_transform_spark.operators.expand_json import (
        expand_json,
    )

    df = spark.createDataFrame(
        [('{"x": {"p": 1}}', '{"y": {"q": "s"}}')], "a string, b string"
    )
    out = expand_json(df, fields=["a", "b"], schema_name_prefix="p.Rec")
    sa, sb = out.schema["a"], out.schema["b"]
    # field a: inner struct {p:bigint} -> p.Rec, root {x:...} -> p.Rec2
    assert sa.dataType["x"].metadata["connect.name"] == "p.Rec"
    assert sa.metadata["connect.name"] == "p.Rec2"
    # field b CONTINUES the numbering: {q:string} -> p.Rec3, root -> p.Rec4
    assert sb.dataType["y"].metadata["connect.name"] == "p.Rec3"
    assert sb.metadata["connect.name"] == "p.Rec4"
    # identical field lists across fields SHARE a name (dedup across fields)
    df2 = spark.createDataFrame(
        [('{"x": {"p": 1}}', '{"x": {"p": 2}}')], "a string, b string"
    )
    out2 = expand_json(df2, fields=["a", "b"], schema_name_prefix="p.Rec")
    assert (
        out2.schema["a"].dataType["x"].metadata["connect.name"]
        == out2.schema["b"].dataType["x"].metadata["connect.name"]
        == "p.Rec"
    )
    assert (
        out2.schema["a"].metadata["connect.name"]
        == out2.schema["b"].metadata["connect.name"]
        == "p.Rec2"
    )
