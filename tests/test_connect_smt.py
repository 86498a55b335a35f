"""Kafka Connect standard-SMT parity (operators/connect_smt.py): each
transform's public semantics on Kafka-wire-shaped records, plus full
connector-config chain parsing with predicates — the configs a reference
deployment chains AROUND ExpandJson (readme.md:38-42)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.operators.connect_smt import (
    connect_transform_chain,
)


def _records(spark):
    rows = [
        (str(i), (i, f"t{i % 2}", 100 + i, float(i) * 1.5), "orders-raw",
         i % 4, i, 1_700_000_000_000 + i * 1000, {"trace": f"x{i}"})
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows,
        "key string, value struct<id:bigint, typ:string, uid:bigint, amt:double>, "
        "topic string, partition int, offset bigint, timestamp bigint, "
        "headers map<string,string>",
    )


def _chain(config):
    return connect_transform_chain(config)


def test_extract_hoist_roundtrip(spark):
    df = _records(spark)
    out = _chain({
        "transforms": "ex",
        "transforms.ex.type": "org.apache.kafka.connect.transforms.ExtractField$Value",
        "transforms.ex.field": "typ",
    })(df)
    assert dict(out.dtypes)["value"] == "string"
    back = _chain({
        "transforms": "h",
        "transforms.h.type": "org.apache.kafka.connect.transforms.HoistField$Value",
        "transforms.h.field": "typ",
    })(out)
    assert [f.name for f in back.schema["value"].dataType.fields] == ["typ"]
    assert back.where(F.col("value.typ") == "t0").count() == 3


def test_flatten_nested_struct(spark):
    df = spark.createDataFrame(
        [((1, (2, "x")),)],
        "value struct<a:int, b:struct<c:int, d:string>>",
    ).withColumn("topic", F.lit("t"))
    out = _chain({
        "transforms": "f",
        "transforms.f.type": "org.apache.kafka.connect.transforms.Flatten$Value",
        "transforms.f.delimiter": "_",
    })(df)
    assert [f.name for f in out.schema["value"].dataType.fields] == ["a", "b_c", "b_d"]
    r = out.select("value.*").first()
    assert (r["a"], r["b_c"], r["b_d"]) == (1, 2, "x")


def test_cast_field_and_whole_value(spark):
    df = _records(spark)
    out = _chain({
        "transforms": "c",
        "transforms.c.type": "org.apache.kafka.connect.transforms.Cast$Value",
        "transforms.c.spec": "id:int32,uid:string",
    })(df)
    dt = {f.name: f.dataType.simpleString() for f in out.schema["value"].dataType.fields}
    assert dt["id"] == "int" and dt["uid"] == "string"
    # whole-value cast on a schemaless (atomic) side
    out2 = _chain({
        "transforms": "k",
        "transforms.k.type": "org.apache.kafka.connect.transforms.Cast$Key",
        "transforms.k.spec": "int64",
    })(df)
    assert dict(out2.dtypes)["key"] == "bigint"


def test_replace_mask_insert(spark):
    df = _records(spark)
    out = _chain({
        "transforms": "r,m,i",
        "transforms.r.type": "org.apache.kafka.connect.transforms.ReplaceField$Value",
        "transforms.r.exclude": "amt",
        "transforms.r.renames": "typ:event_type",
        "transforms.m.type": "org.apache.kafka.connect.transforms.MaskField$Value",
        "transforms.m.fields": "uid",
        "transforms.i.type": "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.i.static.field": "pipeline",
        "transforms.i.static.value": "v1",
        "transforms.i.topic.field": "src_topic!",
        "transforms.i.offset.field": "src_offset?",
    })(df)
    names = [f.name for f in out.schema["value"].dataType.fields]
    assert names == ["id", "event_type", "uid", "pipeline", "src_topic", "src_offset"]
    r = out.first()
    assert r["value"]["uid"] == 0  # zero-value mask
    assert r["value"]["pipeline"] == "v1"
    assert r["value"]["src_topic"] == "orders-raw"
    assert r["value"]["src_offset"] == r["offset"]
    # masking with an explicit replacement literal
    out2 = _chain({
        "transforms": "m",
        "transforms.m.type": "org.apache.kafka.connect.transforms.MaskField$Value",
        "transforms.m.fields": "typ",
        "transforms.m.replacement": "REDACTED",
    })(df)
    assert out2.first()["value"]["typ"] == "REDACTED"


def test_timestamp_converter_all_targets(spark):
    df = spark.createDataFrame(
        [((1, 1_700_000_000_000),)], "value struct<id:int, ts:bigint>"
    ).withColumn("topic", F.lit("t"))
    base = {
        "transforms": "t",
        "transforms.t.type": "org.apache.kafka.connect.transforms.TimestampConverter$Value",
        "transforms.t.field": "ts",
    }
    s = _chain({**base, "transforms.t.target.type": "string",
                "transforms.t.format": "yyyy-MM-dd"})(df)
    assert s.first()["value"]["ts"] == "2023-11-14"
    u = _chain({**base, "transforms.t.target.type": "Timestamp"})(df)
    assert dict(
        (f.name, f.dataType.simpleString())
        for f in u.schema["value"].dataType.fields
    )["ts"] == "timestamp"
    back = _chain({**base, "transforms.t.target.type": "unix"})(u)
    assert back.first()["value"]["ts"] == 1_700_000_000_000  # lossless round trip


def test_regexrouter_value_to_key_and_filter_predicates(spark):
    df = _records(spark)
    # 1 tombstone record
    df = df.withColumn(
        "value", F.when(F.col("offset") == 5, F.lit(None)).otherwise(F.col("value"))
    )
    out = _chain({
        "transforms": "route,v2k,drop",
        "predicates": "tomb",
        "predicates.tomb.type": "org.apache.kafka.connect.transforms.predicates.RecordIsTombstone",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": "(.*)-raw",
        "transforms.route.replacement": "$1-clean",
        "transforms.v2k.type": "org.apache.kafka.connect.transforms.ValueToKey",
        "transforms.v2k.fields": "typ",
        "transforms.drop.type": "org.apache.kafka.connect.transforms.Filter",
        "transforms.drop.predicate": "tomb",
    })(df)
    assert out.count() == 5  # tombstone dropped
    assert out.select("topic").distinct().collect()[0]["topic"] == "orders-clean"
    assert out.where(F.col("key.typ") == "t0").count() == 3
    # per-transform predicate GATES an SMT (negate honored)
    gated = _chain({
        "transforms": "m",
        "predicates": "is_t",
        "predicates.is_t.type": "org.apache.kafka.connect.transforms.predicates.TopicNameMatches",
        "predicates.is_t.pattern": "orders-.*",
        "transforms.m.type": "org.apache.kafka.connect.transforms.MaskField$Value",
        "transforms.m.fields": "uid",
        "transforms.m.predicate": "is_t",
        "transforms.m.negate": "true",
    })(_records(spark))
    # negate=true: topic DOES match, so the mask must NOT apply
    assert gated.agg(F.sum("value.uid")).first()[0] == sum(100 + i for i in range(6))
    # HasHeaderKey
    hdr = _chain({
        "transforms": "drop",
        "predicates": "h",
        "predicates.h.type": "org.apache.kafka.connect.transforms.predicates.HasHeaderKey",
        "predicates.h.name": "trace",
        "transforms.drop.type": "org.apache.kafka.connect.transforms.Filter",
        "transforms.drop.predicate": "h",
    })(_records(spark))
    assert hdr.count() == 0  # every record carries the trace header


def test_chain_order_and_config_errors(spark):
    df = _records(spark)
    # route BEFORE insert captures the routed topic — declaration order
    out = _chain({
        "transforms": "route,i",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": "(.*)-raw",
        "transforms.route.replacement": "$1-clean",
        "transforms.i.type": "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.i.topic.field": "src_topic",
    })(df)
    assert out.first()["value"]["src_topic"] == "orders-clean"
    with pytest.raises(ValueError, match="unsupported SMT"):
        _chain({
            "transforms": "x",
            "transforms.x.type": "org.apache.kafka.connect.transforms.Nope$Value",
        })(df)
    with pytest.raises(ValueError, match="struct"):
        _chain({
            "transforms": "e",
            "transforms.e.type": "org.apache.kafka.connect.transforms.ExtractField$Key",
            "transforms.e.field": "z",
        })(df)  # key is schemaless: Connect's DataException contract


def test_chain_compiles_to_one_projection(spark):
    """Scale contract: a long SMT chain is plan-time column rewriting —
    one Project over the scan, no shuffle, no UDF."""
    df = _records(spark)
    out = _chain({
        "transforms": "r,m,i,c,route",
        "transforms.r.type": "org.apache.kafka.connect.transforms.ReplaceField$Value",
        "transforms.r.renames": "typ:event_type",
        "transforms.m.type": "org.apache.kafka.connect.transforms.MaskField$Value",
        "transforms.m.fields": "uid",
        "transforms.i.type": "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.i.topic.field": "src_topic",
        "transforms.c.type": "org.apache.kafka.connect.transforms.Cast$Value",
        "transforms.c.spec": "id:int32",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": "(.*)-raw",
        "transforms.route.replacement": "$1-x",
    })(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Project") <= 1, plan


def test_insert_and_drop_headers(spark):
    df = _records(spark)
    out = _chain({
        "transforms": "ih,dh",
        "transforms.ih.type": "org.apache.kafka.connect.transforms.InsertHeader",
        "transforms.ih.header": "lineage",
        "transforms.ih.value.literal": "smt-v1",
        "transforms.dh.type": "org.apache.kafka.connect.transforms.DropHeaders",
        "transforms.dh.headers": "trace",
    })(df)
    h = out.first()["headers"]
    assert h == {"lineage": "smt-v1"}  # trace dropped, lineage added
    # InsertHeader REPLACES an existing key (Connect overwrite semantics)
    out2 = _chain({
        "transforms": "ih",
        "transforms.ih.type": "org.apache.kafka.connect.transforms.InsertHeader",
        "transforms.ih.header": "trace",
        "transforms.ih.value.literal": "override",
    })(df)
    assert out2.first()["headers"]["trace"] == "override"


def test_set_schema_metadata(spark):
    df = _records(spark)
    out = _chain({
        "transforms": "s",
        "transforms.s.type": "org.apache.kafka.connect.transforms.SetSchemaMetadata$Value",
        "transforms.s.schema.name": "com.example.Order",
        "transforms.s.schema.version": "3",
    })(df)
    meta = out.schema["value"].metadata
    assert meta["connect.schema.name"] == "com.example.Order"
    assert meta["connect.schema.version"] == 3


def test_chain_dispatches_expandjson_with_downstream_smts(spark):
    """The reference's SMT inside a standard chain (its actual deployment
    shape): ExpandJson$Value parses the JSON value, then ExtractField +
    RegexRouter consume the EXPANDED struct — the chain crosses from the
    reference transform into the stock set seamlessly."""
    df = spark.createDataFrame(
        [(str(i), '{"k": %d, "tag": "t%d"}' % (i * 10, i % 2), "ev-raw")
         for i in range(4)],
        "key string, value string, topic string",
    )
    out = _chain({
        "transforms": "expand,ex,route",
        "transforms.expand.type":
            "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Value",
        "transforms.ex.type": "org.apache.kafka.connect.transforms.ExtractField$Value",
        "transforms.ex.field": "k",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": "(.*)-raw",
        "transforms.route.replacement": "$1-parsed",
    })(df)
    rows = sorted((r["value"], r["topic"]) for r in out.collect())
    assert rows == [(0, "ev-parsed"), (10, "ev-parsed"), (20, "ev-parsed"), (30, "ev-parsed")]


def test_split_dlq_routes_with_context_headers(spark):
    """errors.tolerance=all + DLQ: failing rows are routed (original
    record, re-topiced, __connect.errors.* context headers), good rows
    pass; nothing is dropped or fatal."""
    from kafka_connect_expand_json_transform_spark.operators.connect_smt import (
        split_dlq,
    )

    df = _records(spark)
    good, dlq = split_dlq(
        df, F.col("value.id") % 2 == 0, "orders-dlq", stage="expand-json"
    )
    assert good.count() == 3 and dlq.count() == 3
    assert good.count() + dlq.count() == df.count()  # nothing lost
    r = dlq.first()
    assert r["topic"] == "orders-dlq"
    h = r["headers"]
    assert h["__connect.errors.topic"] == "orders-raw"  # original kept
    assert h["__connect.errors.stage"] == "expand-json"
    assert h["__connect.errors.offset"] == str(r["offset"])
    assert "trace" in h  # pre-existing headers preserved
    # a NULL condition row (three-valued logic) lands in the DLQ, not limbo
    df2 = df.withColumn(
        "value", F.when(F.col("offset") == 0, F.lit(None)).otherwise(F.col("value"))
    )
    g2, d2 = split_dlq(df2, F.col("value.id") % 2 == 0, "dlq")
    assert g2.count() + d2.count() == df2.count()


def test_regexrouter_full_match_only(spark):
    """Connect's RegexRouter rewrites only when the regex matches the
    ENTIRE topic (Pattern.matches + replaceFirst); a partial match is a
    no-op — 'foo'->'bar' on topic 'xfooy' must NOT become 'xbary'."""
    df = spark.createDataFrame([(1,)], "id int").withColumn("topic", F.lit("xfooy"))
    out = _chain({
        "transforms": "route",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": "foo",
        "transforms.route.replacement": "bar",
    })(df)
    assert out.first()["topic"] == "xfooy"  # partial match -> unchanged
    full = _chain({
        "transforms": "route",
        "transforms.route.type": "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": "xfooy",
        "transforms.route.replacement": "bar",
    })(df)
    assert full.first()["topic"] == "bar"  # full match -> rewritten


def test_timestamp_converter_unix_pre1970_floor(spark):
    """target.type=unix floors (Connect's exact integer ms): a pre-1970
    timestamp at -1 ms must come back as -1, not truncate toward zero."""
    df = spark.createDataFrame(
        [((1, -1),), ((2, -12_345),), ((3, 1_700_000_000_001),)],
        "value struct<id:int, ts:bigint>",
    ).withColumn("topic", F.lit("t"))
    base = {
        "transforms": "t",
        "transforms.t.type": "org.apache.kafka.connect.transforms.TimestampConverter$Value",
        "transforms.t.field": "ts",
    }
    ts = _chain({**base, "transforms.t.target.type": "Timestamp"})(df)
    back = _chain({**base, "transforms.t.target.type": "unix"})(ts)
    got = {r["value"]["id"]: r["value"]["ts"] for r in back.collect()}
    assert got == {1: -1, 2: -12_345, 3: 1_700_000_000_001}


def test_expandjson_predicate_rejected_at_parse_time(spark):
    """A per-transform predicate on ExpandJson is unrepresentable (the
    expanded column cannot mix struct and raw rows) — the chain must fail
    at plan time, Connect's fail-at-startup contract, never silently
    expand everything."""
    df = _records(spark)
    with pytest.raises(ValueError, match="predicate.*ExpandJson|ExpandJson.*predicate"):
        _chain({
            "transforms": "e",
            "predicates": "tomb",
            "predicates.tomb.type": "org.apache.kafka.connect.transforms.predicates.RecordIsTombstone",
            "transforms.e.type": "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Value",
            "transforms.e.sourceFields": "typ",
            "transforms.e.predicate": "tomb",
        })(df)


def test_timestamp_router_and_header_from(spark):
    """TimestampRouter (topic := format with ${topic}/${timestamp}) and
    HeaderFrom (copy/move record fields into headers) — the last two
    transforms of the standard Connect SMT set."""
    df = _records(spark)
    routed = _chain({
        "transforms": "tr",
        "transforms.tr.type": "org.apache.kafka.connect.transforms.TimestampRouter",
        "transforms.tr.topic.format": "${topic}-${timestamp}",
        "transforms.tr.timestamp.format": "yyyyMMdd",
    })(df)
    topics = {r["topic"] for r in routed.select("topic").distinct().collect()}
    assert all(t.startswith("orders-raw-20") and len(t) == len("orders-raw-YYYYMMDD")
               for t in topics), topics
    # HeaderFrom copy: header added, field kept
    copied = _chain({
        "transforms": "hf",
        "transforms.hf.type": "org.apache.kafka.connect.transforms.HeaderFrom$Value",
        "transforms.hf.fields": "typ",
        "transforms.hf.headers": "record-type",
        "transforms.hf.operation": "copy",
    })(df)
    r = copied.first()
    assert r["headers"]["record-type"] == r["value"]["typ"]
    assert "typ" in [f.name for f in copied.schema["value"].dataType.fields]
    assert "trace" in r["headers"]  # pre-existing headers preserved
    # HeaderFrom move: field leaves the struct
    moved = _chain({
        "transforms": "hf",
        "transforms.hf.type": "org.apache.kafka.connect.transforms.HeaderFrom$Value",
        "transforms.hf.fields": "typ",
        "transforms.hf.headers": "record-type",
        "transforms.hf.operation": "move",
    })(df)
    assert "typ" not in [f.name for f in moved.schema["value"].dataType.fields]
    assert moved.first()["headers"]["record-type"] is not None
    with pytest.raises(ValueError, match="same length"):
        _chain({
            "transforms": "hf",
            "transforms.hf.type": "org.apache.kafka.connect.transforms.HeaderFrom$Value",
            "transforms.hf.fields": "typ,uid",
            "transforms.hf.headers": "only-one",
        })(df)
