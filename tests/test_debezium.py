"""Debezium CDC support: the ExtractNewRecordState unwrap SMT
(operators/connect_smt.py — io.debezium.transforms public semantics),
envelope decode (sources/debezium.py), the latest-per-key reduce, and the
end-to-end CDC apply into a txlog table (merge_into with the new
``insert_when`` clause so deletes of absent keys are no-ops)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_expand_json_transform_spark.operators.connect_smt import (
    connect_transform_chain,
)
from kafka_connect_expand_json_transform_spark.sources.debezium import (
    apply_cdc,
    debezium_envelope_schema,
    from_debezium,
    latest_changes,
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType()),
    ]
)


def _envelope(before, after, op, ts_ms, lsn):
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {"connector": "postgresql", "db": "shop",
                       "table": "items", "ts_ms": ts_ms, "lsn": lsn},
            "op": op,
            "ts_ms": ts_ms,
        }
    )


def _cdc_frame(spark, *, schemas_enable=False, with_tombstone=False):
    evs = [
        _envelope(None, {"id": 1, "name": "a", "qty": 5}, "c", 1000, 10),
        _envelope({"id": 1, "name": "a", "qty": 5},
                  {"id": 1, "name": "a", "qty": 7}, "u", 2000, 20),
        _envelope(None, {"id": 2, "name": "b", "qty": 1}, "c", 1500, 15),
        _envelope({"id": 2, "name": "b", "qty": 1}, None, "d", 2500, 25),
        _envelope(None, {"id": 3, "name": "c", "qty": 9}, "r", 500, 5),
    ]
    if schemas_enable:
        evs = [json.dumps({"schema": {"type": "struct"}, "payload": json.loads(e)})
               for e in evs]
    rows = [(e, "shop.items") for e in evs]
    if with_tombstone:
        rows.append((None, "shop.items"))
    return spark.createDataFrame(rows, "value string, topic string")


def _unwrap(cfg_extra=None):
    cfg = {
        "transforms": "unwrap",
        "transforms.unwrap.type": "io.debezium.transforms.ExtractNewRecordState",
    }
    cfg.update(cfg_extra or {})
    return connect_transform_chain(cfg)


def test_envelope_decode_and_tombstone_null(spark):
    df = from_debezium(_cdc_frame(spark, with_tombstone=True), ROW_SCHEMA)
    assert df.where(F.col("value").isNull()).count() == 1
    got = df.where(F.col("value.op") == "u").select("value.after.qty").first()[0]
    assert got == 7
    lsns = [r[0] for r in df.where(F.col("value").isNotNull())
            .select("value.source.lsn").collect()]
    assert sorted(lsns) == [5, 10, 15, 20, 25]


def test_envelope_decode_schemas_enable(spark):
    df = from_debezium(
        _cdc_frame(spark, schemas_enable=True), ROW_SCHEMA, schemas_enable=True
    )
    assert df.where(F.col("value.op") == "d").count() == 1


def test_unwrap_default_drops_tombstones_and_deletes(spark):
    df = from_debezium(_cdc_frame(spark, with_tombstone=True), ROW_SCHEMA)
    out = _unwrap()(df)
    assert [f.name for f in out.schema["value"].dataType.fields] == [
        "id", "name", "qty"
    ]
    rows = {(r.id, r.qty) for r in out.select("value.*").collect()}
    assert rows == {(1, 5), (1, 7), (2, 1), (3, 9)}  # no delete, no tombstone


def test_unwrap_rewrite_takes_before_state_and_flags(spark):
    df = from_debezium(_cdc_frame(spark), ROW_SCHEMA)
    out = _unwrap({
        "transforms.unwrap.delete.handling.mode": "rewrite",
        "transforms.unwrap.add.fields": "op,ts_ms,source.lsn",
    })(df)
    names = [f.name for f in out.schema["value"].dataType.fields]
    assert names == ["id", "name", "qty", "__op", "__ts_ms", "__source_lsn",
                     "__deleted"]
    d = out.where(F.col("value.__deleted") == "true").select("value.*").collect()
    assert len(d) == 1 and d[0].id == 2 and d[0].qty == 1  # before state
    assert d[0]["__source_lsn"] == 25
    assert out.where(F.col("value.__deleted") == "false").count() == 4


def test_unwrap_none_mode_nulls_delete_values(spark):
    df = from_debezium(_cdc_frame(spark), ROW_SCHEMA)
    out = _unwrap({"transforms.unwrap.delete.handling.mode": "none"})(df)
    assert out.count() == 5
    assert out.where(F.col("value").isNull()).count() == 1


def test_unwrap_add_fields_alias(spark):
    df = from_debezium(_cdc_frame(spark), ROW_SCHEMA)
    out = _unwrap({"transforms.unwrap.add.fields": "op:operation"})(df)
    assert "operation" in [f.name for f in out.schema["value"].dataType.fields]


def test_unwrap_rejects_non_envelope_and_predicate(spark):
    flat = spark.createDataFrame([((1,),)], "value struct<a:int>")
    with pytest.raises(ValueError, match="envelope"):
        _unwrap()(flat)
    df = from_debezium(_cdc_frame(spark), ROW_SCHEMA)
    with pytest.raises(ValueError, match="predicate"):
        _unwrap({
            "predicates": "p",
            "predicates.p.type":
                "org.apache.kafka.connect.transforms.predicates.TopicNameMatches",
            "predicates.p.pattern": ".*",
            "transforms.unwrap.predicate": "p",
        })(df)


def test_latest_changes_keeps_last_per_key(spark):
    df = from_debezium(_cdc_frame(spark), ROW_SCHEMA)
    out = _unwrap({
        "transforms.unwrap.delete.handling.mode": "rewrite",
        "transforms.unwrap.add.fields": "op,ts_ms,source.lsn",
    })(df).select("value.*")
    last = latest_changes(out, ["id"], order_by=["__ts_ms", "__source_lsn"])
    got = {r.id: (r["__op"], r.qty) for r in last.collect()}
    assert got == {1: ("u", 7), 2: ("d", 1), 3: ("r", 9)}


def test_apply_cdc_end_to_end(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources import txlog as TX

    root = str(tmp_path / "items")
    base = spark.createDataFrame(
        [(2, "b", 1), (4, "d", 4)], "id bigint, name string, qty int"
    )
    TX.append_table(base, root)
    df = from_debezium(_cdc_frame(spark), ROW_SCHEMA)
    changes = _unwrap({
        "transforms.unwrap.delete.handling.mode": "rewrite",
        "transforms.unwrap.add.fields": "op,ts_ms,source.lsn",
    })(df).select("value.*").withColumnRenamed("__source_lsn", "__lsn")
    upd4 = spark.createDataFrame(
        [(4, "d", 6, "u", 3000, 30)],
        "id bigint, name string, qty int, __op string, __ts_ms bigint, __lsn bigint",
    )
    version, stats = apply_cdc(spark, root, changes.unionByName(upd4, allowMissingColumns=True), ["id"])
    final = {r.id: (r.name, r.qty)
             for r in TX.read_table(spark, root).collect()}
    # id=1 upserted (insert: key absent from base), id=2 deleted,
    # id=3 inserted, id=4 matched-updated to qty 6
    assert final == {1: ("a", 7), 3: ("c", 9), 4: ("d", 6)}
    assert stats == {"inserted": 2, "updated": 1, "deleted": 1}


def test_apply_cdc_delete_of_absent_key_is_noop(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources import txlog as TX

    root = str(tmp_path / "items2")
    TX.append_table(
        spark.createDataFrame([(9, "z", 1)], "id bigint, name string, qty int"),
        root,
    )
    dels = spark.createDataFrame(
        [(404, "ghost", 3, "d", 100, 1)],
        "id bigint, name string, qty int, __op string, __ts_ms bigint, __lsn bigint",
    )
    version, stats = apply_cdc(spark, root, dels, ["id"])
    assert stats == {"inserted": 0, "updated": 0, "deleted": 0}
    assert [r.id for r in TX.read_table(spark, root).collect()] == [9]


def test_envelope_schema_shape():
    env = debezium_envelope_schema(ROW_SCHEMA)
    assert [f.name for f in env.fields] == ["before", "after", "source", "op", "ts_ms"]
    assert env["before"].dataType == ROW_SCHEMA

OUTBOX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("aggregatetype", T.StringType()),
        T.StructField("aggregateid", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _outbox_frame(spark, ops=("c", "c", "r", "d")):
    rows = []
    for i, op in enumerate(ops):
        after = (None if op == "d" else
                 {"id": f"ev{i}", "aggregatetype": "order" if i % 2 == 0 else "customer",
                  "aggregateid": 100 + i, "type": "Created",
                  "payload": json.dumps({"amount": 10 * i, "note": f"n{i}"})})
        rows.append((json.dumps({
            "before": None, "after": after,
            "source": {"connector": "postgresql", "db": "shop",
                       "table": "outbox", "ts_ms": 1000 + i, "lsn": i},
            "op": op, "ts_ms": 1000 + i,
        }), "shop.outbox",
            {"trace": f"t{i}"}))
    df = spark.createDataFrame(
        rows, "value string, topic string, headers map<string,string>"
    )
    return from_debezium(df, OUTBOX_SCHEMA)


def _router(cfg_extra=None):
    cfg = {
        "transforms": "outbox",
        "transforms.outbox.type": "io.debezium.transforms.outbox.EventRouter",
    }
    cfg.update(cfg_extra or {})
    return connect_transform_chain(cfg)


def test_event_router_defaults(spark):
    out = _router()(_outbox_frame(spark))
    rows = out.select("topic", "key", "value").collect()
    assert len(rows) == 3  # the delete (janitor row) is dropped
    assert {r.topic for r in rows} == {"outbox.event.order", "outbox.event.customer"}
    assert {r.key for r in rows} == {"100", "101", "102"}
    assert all(json.loads(r.value)["amount"] == 10 * i
               for i, r in zip((0, 1, 2), sorted(rows, key=lambda r: r.key)))


def test_event_router_placements_and_template(spark):
    out = _router({
        "transforms.outbox.route.topic.replacement": "domain.${routedByValue}.events",
        "transforms.outbox.table.fields.additional.placement":
            "id:header:eventId,type:envelope:eventType",
    })(_outbox_frame(spark))
    r = out.where(F.col("key") == "100").first()
    assert r.topic == "domain.order.events"
    assert r.headers["eventId"] == "ev0"
    assert r.headers["trace"] == "t0"  # pre-existing headers preserved
    assert r.value.eventType == "Created"
    assert json.loads(r.value.payload)["amount"] == 0


def test_event_router_refuses_updates_in_error_mode(spark):
    df = _outbox_frame(spark, ops=("c", "u"))
    out = _router({
        "transforms.outbox.table.op.invalid.behavior": "error",
    })(df)
    with pytest.raises(Exception, match="append-only"):
        out.collect()
    # default (warn) skips silently
    assert _router()(df).count() == 1


def test_event_router_then_expand_json_chain(spark):
    # the outbox payoff: routed payload JSON -> the reference's ExpandJson
    out = connect_transform_chain({
        "transforms": "outbox,expand",
        "transforms.outbox.type": "io.debezium.transforms.outbox.EventRouter",
        "transforms.expand.type":
            "com.github.joshuagrisham.kafka.connect.transforms.ExpandJson$Value",
    })(_outbox_frame(spark))
    got = out.select(F.col("value.amount").alias("a")).orderBy("a").collect()
    assert [r.a for r in got] == [0, 10, 20]
