"""Pure-Python Iceberg metadata reader (sources/iceberg_reader.py):
snapshot + time-travel replay through metadata.json -> Avro manifest
list -> Avro manifests -> parquet, all hand-written per the PUBLIC
iceberg.apache.org spec (no iceberg runtime exists in this container);
schema mapping, v1/v2 layouts, relocated-table path re-rooting, and the
fail-closed rule on v2 delete manifests."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_expand_json_transform_spark.sources import avro_codec as AC
from kafka_connect_expand_json_transform_spark.sources.iceberg_reader import (
    IcebergUnsupported,
    iceberg_snapshots,
    read_iceberg,
)

ENTRY_V2 = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ]}},
    ],
}
ENTRY_V1 = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ]}},
    ],
}
MLIST = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int"},
    ],
}

FIELDS = [
    {"id": 1, "name": "id", "required": True, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "string"},
]


def _table(tmp_path, *, fmt_version=2, location=None, deletes=False):
    root = str(tmp_path / "iceb")
    loc = location or ("file://" + root)
    os.makedirs(root + "/metadata")
    os.makedirs(root + "/data")
    sch = pa.schema([("id", pa.int64()), ("v", pa.string())])
    for name, rows in (("a", {"id": [1, 2], "v": ["x", "y"]}),
                       ("b", {"id": [3], "v": ["z"]}),
                       ("c", {"id": [4], "v": ["w"]})):
        pq.write_table(pa.table(rows, schema=sch), f"{root}/data/{name}.parquet")

    entry_schema = ENTRY_V2 if fmt_version == 2 else ENTRY_V1

    def data_file(name):
        d = {"file_path": f"{loc}/data/{name}.parquet", "file_format": "parquet",
             "record_count": 1, "file_size_in_bytes": 1}
        if fmt_version == 2:
            d["content"] = 0
        return d

    def manifest(name, entries):
        p = f"{root}/metadata/{name}.avro"
        AC.write_container(p, entry_schema, entries, codec="null")
        return p

    m1 = manifest("m1", [
        {"status": 1, "data_file": data_file("a")},
        {"status": 1, "data_file": data_file("b")},
    ])
    m2 = manifest("m2", [
        {"status": 0, "data_file": data_file("a")},
        {"status": 2, "data_file": data_file("b")},
        {"status": 1, "data_file": data_file("c")},
    ])

    def mlist(name, manifests, contents):
        p = f"{root}/metadata/{name}.avro"
        AC.write_container(p, MLIST, [
            {"manifest_path": f"{loc}/metadata/{os.path.basename(m)}",
             "manifest_length": 1, "content": c}
            for m, c in zip(manifests, contents)
        ], codec="null")
        return p

    ml1 = mlist("snap-1-list", [m1], [0])
    ml2 = mlist("snap-2-list", [m2], [0])
    if deletes:
        ml2 = mlist("snap-2-list", [m2, m1], [0, 1])

    meta = {
        "format-version": fmt_version,
        "table-uuid": "0000",
        "location": loc,
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1000,
             "summary": {"operation": "append"},
             "manifest-list": f"{loc}/metadata/snap-1-list.avro"},
            {"snapshot-id": 2, "timestamp-ms": 2000,
             "summary": {"operation": "overwrite"},
             "manifest-list": f"{loc}/metadata/snap-2-list.avro"},
        ],
    }
    if fmt_version == 2:
        meta["schemas"] = [{"schema-id": 0, "type": "struct", "fields": FIELDS}]
        meta["current-schema-id"] = 0
    else:
        meta["schema"] = {"type": "struct", "fields": FIELDS}
    with open(root + "/metadata/v1.metadata.json", "w") as fh:
        json.dump(meta, fh)
    with open(root + "/metadata/version-hint.text", "w") as fh:
        fh.write("1")
    return root


def test_current_snapshot_and_time_travel(spark, tmp_path):
    root = _table(tmp_path)
    now = read_iceberg(spark, root)
    assert sorted(r.id for r in now.collect()) == [1, 2, 4]
    old = read_iceberg(spark, root, snapshot_id=1)
    assert sorted(r.id for r in old.collect()) == [1, 2, 3]
    assert dict(now.dtypes) == {"id": "bigint", "v": "string"}
    with pytest.raises(ValueError, match="snapshot 9"):
        read_iceberg(spark, root, snapshot_id=9)


def test_snapshot_listing(tmp_path):
    root = _table(tmp_path)
    snaps = iceberg_snapshots(root)
    assert [(s["snapshot_id"], s["operation"]) for s in snaps] == [
        (2, "overwrite"), (1, "append")
    ]


def test_format_v1_layout(spark, tmp_path):
    root = _table(tmp_path, fmt_version=1)
    assert sorted(r.id for r in read_iceberg(spark, root).collect()) == [1, 2, 4]


def test_relocated_table_re_rooting(spark, tmp_path):
    # metadata written against the ORIGINAL location; table copied here
    root = _table(tmp_path, location="file:///original/warehouse/tbl")
    assert sorted(r.id for r in read_iceberg(spark, root).collect()) == [1, 2, 4]


def test_delete_manifests_fail_closed(spark, tmp_path):
    root = _table(tmp_path, deletes=True)
    with pytest.raises(IcebergUnsupported, match="delete"):
        read_iceberg(spark, root)


def test_schema_mapping_nested_and_decimal():
    from kafka_connect_expand_json_transform_spark.sources.iceberg_reader import (
        _spark_type,
    )
    from pyspark.sql import types as T

    t = _spark_type({
        "type": "struct", "fields": [
            {"id": 1, "name": "d", "required": True, "type": "decimal(10,2)"},
            {"id": 2, "name": "day", "required": False, "type": "date"},
            {"id": 3, "name": "tags", "required": False, "type": {
                "type": "list", "element-id": 4, "element": "string",
                "element-required": False}},
            {"id": 5, "name": "kv", "required": False, "type": {
                "type": "map", "key-id": 6, "key": "string",
                "value-id": 7, "value": "long", "value-required": False}},
        ],
    })
    assert t["d"].dataType == T.DecimalType(10, 2)
    assert t["day"].dataType == T.DateType()
    assert t["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert t["kv"].dataType == T.MapType(T.StringType(), T.LongType(), True)
    with pytest.raises(IcebergUnsupported):
        _spark_type("geography")


def test_identity_partition_pruning(spark, tmp_path):
    root = str(tmp_path / "part")
    loc = "file://" + root
    os.makedirs(root + "/metadata")
    os.makedirs(root + "/data")
    sch = pa.schema([("id", pa.int64()), ("day", pa.string())])
    pq.write_table(pa.table({"id": [1], "day": ["d1"]}, schema=sch),
                   root + "/data/p1.parquet")
    pq.write_table(pa.table({"id": [2], "day": ["d2"]}, schema=sch),
                   root + "/data/p2.parquet")
    entry = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": [
                            {"name": "day", "type": "string"}]}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ]}},
        ],
    }
    AC.write_container(root + "/metadata/m.avro", entry, [
        {"status": 1, "data_file": {
            "content": 0, "file_path": f"{loc}/data/p1.parquet",
            "file_format": "parquet", "partition": {"day": "d1"},
            "record_count": 1, "file_size_in_bytes": 1}},
        {"status": 1, "data_file": {
            "content": 0, "file_path": f"{loc}/data/p2.parquet",
            "file_format": "parquet", "partition": {"day": "d2"},
            "record_count": 1, "file_size_in_bytes": 1}},
    ], codec="null")
    AC.write_container(root + "/metadata/sl.avro", MLIST, [
        {"manifest_path": f"{loc}/metadata/m.avro",
         "manifest_length": 1, "content": 0}], codec="null")
    meta = {
        "format-version": 2, "table-uuid": "0000", "location": loc,
        "current-snapshot-id": 1,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": True, "type": "long"},
            {"id": 2, "name": "day", "required": False, "type": "string"},
        ]}],
        "current-schema-id": 0,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1000,
                       "summary": {"operation": "append"},
                       "manifest-list": f"{loc}/metadata/sl.avro"}],
    }
    with open(root + "/metadata/v1.metadata.json", "w") as fh:
        json.dump(meta, fh)
    full = read_iceberg(spark, root)
    assert sorted(r.id for r in full.collect()) == [1, 2]
    pruned = read_iceberg(spark, root, where=[("day", "=", "d2")])
    assert [r.id for r in pruned.collect()] == [2]
    assert pruned.inputFiles() == [f for f in full.inputFiles() if "p2" in f]


def test_as_of_timestamp(spark, tmp_path):
    root = _table(tmp_path)  # snapshots at ts 1000 and 2000
    old = read_iceberg(spark, root, as_of_timestamp_ms=1500)
    assert sorted(r.id for r in old.collect()) == [1, 2, 3]
    now = read_iceberg(spark, root, as_of_timestamp_ms=99999)
    assert sorted(r.id for r in now.collect()) == [1, 2, 4]
    with pytest.raises(ValueError, match="predates"):
        read_iceberg(spark, root, as_of_timestamp_ms=5)
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, root, snapshot_id=1, as_of_timestamp_ms=1500)


def _drain(q, seconds=60, expect_error=False):
    import time as _t
    deadline = _t.time() + seconds
    while _t.time() < deadline:
        if q.exception() is not None:
            break
        if q.lastProgress is not None and not q.status["isDataAvailable"]:
            break
        _t.sleep(0.25)
    q.stop()
    try:
        q.awaitTermination()
    except Exception:
        if not expect_error:
            raise


def test_icebergstream_appends_and_overwrite_contract(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources.iceberg_reader import (
        register_iceberg_stream_source,
    )

    # _table: snapshot 1 appends a+b; snapshot 2 deletes b, adds c
    root = _table(tmp_path)
    register_iceberg_stream_source(spark)
    q = (
        spark.readStream.format("icebergstream").option("path", root).load()
        .writeStream.format("memory").queryName("sg_icestream")
        .outputMode("append").start()
    )
    _drain(q, expect_error=True)
    # snapshot 2 is an overwrite with deleted entries -> abort by default
    assert q.exception() is not None
    q2 = (
        spark.readStream.format("icebergstream").option("path", root)
        .option("ignoreChanges", "true").load()
        .writeStream.format("memory").queryName("sg_icestream2")
        .outputMode("append").start()
    )
    _drain(q2)
    # snapshot 1 adds ids 1,2,3; snapshot 2 re-streams only its ADDED file
    assert sorted(r.id for r in spark.table("sg_icestream2").collect()) == [
        1, 2, 3, 4
    ]
