"""Pure-Python Hudi COPY_ON_WRITE reader (sources/hudi_reader.py):
file-slice resolution (newest slice per file group), time travel by
instant, meta-column handling, timeline listing, and the fail-closed
rules — against a table hand-written per the public hudi.apache.org
timeline/file-layout docs (no hudi bundle exists in this container)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
    HudiUnsupported,
    hudi_timeline,
    read_hudi,
)

C1, C2 = "20260101000000000", "20260102000000000"


def _props(root, ttype="COPY_ON_WRITE"):
    os.makedirs(os.path.join(root, ".hoodie"), exist_ok=True)
    with open(os.path.join(root, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(f"hoodie.table.name=t\nhoodie.table.type={ttype}\n")


def _data(root, rel, ids, commit):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(pa.table({
        "_hoodie_commit_time": [commit] * len(ids),
        "id": ids, "v": [f"v{i}" for i in ids],
    }), p)


def _commit(root, instant, partition_stats):
    with open(os.path.join(root, ".hoodie", f"{instant}.commit"), "w") as fh:
        json.dump({"partitionToWriteStats": partition_stats}, fh)


def _table(tmp_path, ttype="COPY_ON_WRITE"):
    root = str(tmp_path / "hudi")
    _props(root, ttype)
    # c1: file groups fg1 + fg2; c2 rewrites fg1's slice (CoW update)
    _data(root, f"p/fg1_0-0-0_{C1}.parquet", [1, 2], C1)
    _data(root, f"p/fg2_0-0-0_{C1}.parquet", [3], C1)
    _data(root, f"p/fg1_0-0-0_{C2}.parquet", [1, 2, 9], C2)
    _commit(root, C1, {"p": [
        {"fileId": "fg1", "path": f"p/fg1_0-0-0_{C1}.parquet"},
        {"fileId": "fg2", "path": f"p/fg2_0-0-0_{C1}.parquet"},
    ]})
    _commit(root, C2, {"p": [
        {"fileId": "fg1", "path": f"p/fg1_0-0-0_{C2}.parquet"},
    ]})
    return root


def test_latest_slice_per_file_group(spark, tmp_path):
    root = _table(tmp_path)
    df = read_hudi(spark, root)
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 9]
    assert not [c for c in df.columns if c.startswith("_hoodie_")]
    kept = read_hudi(spark, root, keep_meta=True)
    assert "_hoodie_commit_time" in kept.columns


def test_time_travel_by_instant(spark, tmp_path):
    root = _table(tmp_path)
    old = read_hudi(spark, root, as_of_instant=C1)
    assert sorted(r.id for r in old.collect()) == [1, 2, 3]
    with pytest.raises(ValueError, match="predates"):
        read_hudi(spark, root, as_of_instant="19990101000000000")


def test_timeline_newest_first(tmp_path):
    root = _table(tmp_path)
    assert [c["instant"] for c in hudi_timeline(root)] == [C2, C1]


C3 = "20260103000000000"

_REC_SCHEMA = {
    "type": "record", "name": "rec", "fields": [
        {"name": "_hoodie_commit_time", "type": "string"},
        {"name": "_hoodie_record_key", "type": "string"},
        {"name": "id", "type": "long"},
        {"name": "v", "type": "string"},
    ],
}


def _mor_data(root, rel, ids, commit):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(pa.table({
        "_hoodie_commit_time": [commit] * len(ids),
        "_hoodie_record_key": [str(i) for i in ids],
        "id": ids, "v": [f"v{i}" for i in ids],
    }), p)


def _rec(commit, i, v=None):
    return {"_hoodie_commit_time": commit, "_hoodie_record_key": str(i),
            "id": i, "v": v or f"v{i}"}


def _deltacommit(root, instant, partition_stats):
    with open(os.path.join(root, ".hoodie", f"{instant}.deltacommit"),
              "w") as fh:
        json.dump({"partitionToWriteStats": partition_stats}, fh)


def _mor_table(tmp_path):
    """MoR table: base fg1=[1,2,3] at C1; deltacommit C2 appends a log
    with an update (1 -> v1b), an insert (5), and a delete (2)."""
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        write_hudi_log_file,
    )

    root = str(tmp_path / "mor")
    _props(root, ttype="MERGE_ON_READ")
    _mor_data(root, f"p/fg1_0-0-0_{C1}.parquet", [1, 2, 3], C1)
    log_rel = f"p/.fg1_{C1}.log.1_0-0-0"
    write_hudi_log_file(os.path.join(root, log_rel), [
        {"type": "avro", "instant": C2, "schema": _REC_SCHEMA,
         "records": [_rec(C2, 1, "v1b"), _rec(C2, 5)]},
        {"type": "delete", "instant": C2, "keys": ["2"]},
    ])
    _commit(root, C1, {"p": [
        {"fileId": "fg1", "path": f"p/fg1_0-0-0_{C1}.parquet"}]})
    _deltacommit(root, C2, {"p": [{"fileId": "fg1", "path": log_rel}]})
    return root, log_rel


def test_mor_snapshot_merge(spark, tmp_path):
    root, _log = _mor_table(tmp_path)
    df = read_hudi(spark, root)
    got = sorted((r.id, r.v) for r in df.collect())
    # 1 updated, 2 deleted, 3 carried, 5 inserted
    assert got == [(1, "v1b"), (3, "v3"), (5, "v5")]
    assert not [c for c in df.columns if c.startswith("_hoodie_")]
    kept = read_hudi(spark, root, keep_meta=True)
    assert "_hoodie_record_key" in kept.columns


def test_mor_time_travel_and_uncommitted_blocks(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        write_hudi_log_file,
    )

    root, log_rel = _mor_table(tmp_path)
    # time travel to C1: the C2 deltacommit (and its blocks) is invisible
    old = read_hudi(spark, root, as_of_instant=C1)
    assert sorted((r.id, r.v) for r in old.collect()) == [
        (1, "v1"), (2, "v2"), (3, "v3")]
    # an appended block whose instant has NO completed deltacommit is an
    # uncommitted write: the scanner must skip it
    write_hudi_log_file(os.path.join(root, log_rel), [
        {"type": "avro", "instant": "20990101000000000",
         "schema": _REC_SCHEMA,
         "records": [_rec("20990101000000000", 99)]},
    ])
    assert sorted(r.id for r in read_hudi(spark, root).collect()) == [1, 3, 5]


def test_mor_rollback_command_block(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        write_hudi_log_file,
    )

    root, log_rel = _mor_table(tmp_path)
    # deltacommit C3 inserts 7, then a rollback command block targets C3:
    # its records must not surface even though C3 is a completed instant
    write_hudi_log_file(os.path.join(root, log_rel), [
        {"type": "avro", "instant": C3, "schema": _REC_SCHEMA,
         "records": [_rec(C3, 7)]},
        {"type": "rollback", "instant": f"{C3}9", "target_instant": C3},
    ])
    _deltacommit(root, C3, {"p": [{"fileId": "fg1", "path": log_rel}]})
    assert sorted(r.id for r in read_hudi(spark, root).collect()) == [1, 3, 5]


def test_mor_log_only_file_group(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        write_hudi_log_file,
    )

    root, _log = _mor_table(tmp_path)
    # fg2 has NO base file — a log-only first slice (insert into log)
    log2 = f"p/.fg2_{C2}.log.1_0-0-0"
    write_hudi_log_file(os.path.join(root, log2), [
        {"type": "avro", "instant": C3, "schema": _REC_SCHEMA,
         "records": [_rec(C3, 42)]},
    ])
    _deltacommit(root, C3, {"p": [{"fileId": "fg2", "path": log2}]})
    assert sorted(r.id for r in read_hudi(spark, root).collect()) == [
        1, 3, 5, 42]


def test_mor_fail_closed_gates(spark, tmp_path):
    root, _log = _mor_table(tmp_path)
    # pending compaction: slices are mid-rewrite -> refuse
    marker = os.path.join(root, ".hoodie",
                          f"{C3}.compaction.requested")
    open(marker, "w").close()
    with pytest.raises(HudiUnsupported, match="pending compaction"):
        read_hudi(spark, root)
    os.remove(marker)


def test_mor_incremental_query(spark, tmp_path):
    # r9: MoR incremental — merged newest in-range version of each
    # changed record; in-range deletes drop out (the native relation's
    # contract).  _mor_table: C2 updates 1 -> v1b, inserts 5, deletes 2.
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        read_hudi_incremental,
    )

    root, _log = _mor_table(tmp_path)
    inc = read_hudi_incremental(spark, root, begin_instant=C1)
    got = sorted((r.id, r.v) for r in inc.collect())
    assert got == [(1, "v1b"), (5, "v5")]
    with pytest.raises(ValueError, match="no commits"):
        read_hudi_incremental(spark, root, begin_instant=C3)


def test_mor_virtual_keys_fail_closed(spark, tmp_path):
    # base files without _hoodie_record_key: log records cannot be
    # matched to base rows -> refuse rather than mis-merge
    root = str(tmp_path / "vk")
    _props(root, ttype="MERGE_ON_READ")
    _data(root, f"p/fg1_0-0-0_{C1}.parquet", [1, 2], C1)  # no record key
    _commit(root, C1, {"p": [
        {"fileId": "fg1", "path": f"p/fg1_0-0-0_{C1}.parquet"}]})
    with pytest.raises(HudiUnsupported, match="record_key"):
        read_hudi(spark, root)


def test_replacecommit_clustering_applied(spark, tmp_path):
    # clustering: a replacecommit merges fg1+fg2 into a new group fg3 —
    # the old groups' slices die at the replacement, the new file lives;
    # time travel BEFORE the replacecommit still sees the old groups.
    root = _table(tmp_path)  # c1: fg1=[1,2] fg2=[3]; c2: fg1->[1,2,9]
    C3 = "20260103000000000"
    _data(root, f"p/fg3_0-0-0_{C3}.parquet", [1, 2, 3, 9], C3)
    with open(os.path.join(root, ".hoodie", f"{C3}.replacecommit"), "w") as fh:
        json.dump({
            "partitionToWriteStats": {"p": [
                {"fileId": "fg3", "path": f"p/fg3_0-0-0_{C3}.parquet"}]},
            "partitionToReplaceFileIds": {"p": ["fg1", "fg2"]},
        }, fh)
    assert sorted(r.id for r in read_hudi(spark, root).collect()) == [1, 2, 3, 9]
    # exactly ONE live slice (no double rows from the replaced groups)
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        _live_slices,
    )
    assert len(_live_slices(root, None)) == 1
    # pre-replacement time travel sees the old layout
    assert sorted(r.id for r in read_hudi(spark, root,
                                          as_of_instant=C2).collect()) == [1, 2, 3, 9]
    assert len(_live_slices(root, C2)) == 2
    # an in-flight (empty) instant contributes nothing
    open(os.path.join(root, ".hoodie", f"{C3}9.commit"), "w").close()
    assert sorted(r.id for r in read_hudi(spark, root).collect()) == [1, 2, 3, 9]


def test_incremental_query_mode(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        read_hudi_incremental,
    )

    # _table: c1 writes fg1=[1,2] + fg2=[3]; c2 rewrites fg1 as [1,2,9]
    # with commit-time tags, so rows written BY c2 are exactly fg1's c2
    # slice rows tagged C2 — but the fixture tags ALL slice rows with the
    # slice's commit, matching CoW reality only for the NEW row; emulate
    # properly: build a slice where carried rows keep their original tag
    root = str(tmp_path / "hinc")
    _props(root)
    _data(root, f"p/fg1_0-0-0_{C1}.parquet", [1, 2], C1)
    p = os.path.join(root, f"p/fg1_0-0-0_{C2}.parquet")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(pa.table({
        "_hoodie_commit_time": [C1, C1, C2],  # carried rows keep c1's tag
        "id": [1, 2, 9], "v": ["v1", "v2", "v9"],
    }), p)
    _commit(root, C1, {"p": [
        {"fileId": "fg1", "path": f"p/fg1_0-0-0_{C1}.parquet"}]})
    _commit(root, C2, {"p": [
        {"fileId": "fg1", "path": f"p/fg1_0-0-0_{C2}.parquet"}]})
    inc = read_hudi_incremental(spark, root, begin_instant=C1)
    assert [(r.id, r.v) for r in inc.collect()] == [(9, "v9")]
    with pytest.raises(ValueError, match="no commits"):
        read_hudi_incremental(spark, root, begin_instant=C2)


def _drain_q(q, seconds=60, expect_error=False):
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


def test_hudistream_cow_commits(spark, tmp_path):
    # r9: the hudistream source — instant offsets, one micro-batch of the
    # rows WRITTEN by each new commit; a CoW rewrite's carried rows are
    # excluded by the _hoodie_commit_time filter (the incremental
    # contract).  _table: C1 writes ids 1,2 (fg1) + 3 (fg2); C2 rewrites
    # fg1 carrying 1,2 and adding 9 -> the stream must emit 1,2,3,9 (NOT
    # 1,2 twice).
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        register_hudi_stream_source,
    )

    root = _table(tmp_path)
    register_hudi_stream_source(spark)
    q = (
        spark.readStream.format("hudistream").option("path", root).load()
        .writeStream.format("memory").queryName("sg_hudistream")
        .outputMode("append").start()
    )
    _drain_q(q)
    assert q.exception() is None
    got = sorted(r.id for r in spark.table("sg_hudistream").collect())
    # C2's slice stamps ALL its rows with C2 (the fixture models an
    # update of 1,2 plus insert of 9), so the stream re-emits 1,2 as
    # UPDATES — the incremental contract's changed-row semantics
    assert got == [1, 1, 2, 2, 3, 9]


def test_hudistream_replacecommit_contract(spark, tmp_path):
    # clustering/insert_overwrite instants abort unless ignoreChanges;
    # with it, the commit-time filter means a pure clustering (rewritten
    # records keep their original commit time) contributes nothing
    import json as _json

    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        register_hudi_stream_source,
    )

    root = _table(tmp_path)
    # C3: replacecommit clustering fg1+fg2 into fg3 (rows keep their
    # ORIGINAL commit times — a rewrite, not new data)
    _data(root, f"p/fg3_0-0-0_{C3}.parquet", [1, 2, 9, 3], C2)
    with open(os.path.join(root, ".hoodie", f"{C3}.replacecommit"),
              "w") as fh:
        _json.dump({
            "partitionToWriteStats": {"p": [
                {"fileId": "fg3", "path": f"p/fg3_0-0-0_{C3}.parquet"}]},
            "partitionToReplaceFileIds": {"p": [["fg1"], ["fg2"]][0]
                                          + ["fg2"]},
        }, fh)
    register_hudi_stream_source(spark)
    q = (
        spark.readStream.format("hudistream").option("path", root).load()
        .writeStream.format("memory").queryName("sg_hudistream_rc")
        .outputMode("append").start()
    )
    _drain_q(q, expect_error=True)
    assert q.exception() is not None and "replacecommit" in str(
        q.exception())
    q2 = (
        spark.readStream.format("hudistream").option("path", root)
        .option("ignoreChanges", "true").load()
        .writeStream.format("memory").queryName("sg_hudistream_rc2")
        .outputMode("append").start()
    )
    _drain_q(q2)
    assert q2.exception() is None
    got = sorted(r.id for r in spark.table("sg_hudistream_rc2").collect())
    # same commit rows as before; the clustering contributed nothing new
    assert got == [1, 1, 2, 2, 3, 9]


def test_hudi_append_roundtrip(spark, tmp_path, monkeypatch):
    # r9: the CoW append writer — timeline-layout commits readable by the
    # same reader (snapshot + time travel), streamable by hudistream;
    # instants must be lexically increasing; a racing claim loses cleanly
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        HudiCommitConflict,
        hudi_append,
        read_hudi,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "hw")
    df1 = spark.range(0, 4).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v"))
    i1 = hudi_append(df1.coalesce(1), root, record_key="k")
    df2 = spark.range(4, 6).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v"))
    i2 = hudi_append(df2.coalesce(1), root, record_key="k",
                     instant=str(int(i1) + 1000))
    assert i2 > i1
    got = sorted(r.k for r in read_hudi(spark, root).collect())
    assert got == list(range(6))
    assert sorted(
        r.k for r in read_hudi(spark, root, as_of_instant=i1).collect()
    ) == [0, 1, 2, 3]
    # meta columns present when kept
    kept = read_hudi(spark, root, keep_meta=True)
    assert {"_hoodie_commit_time", "_hoodie_record_key"} <= set(kept.columns)
    # stale instant refuses
    with pytest.raises(ValueError, match="not after the head"):
        hudi_append(df1, root, record_key="k", instant=i1)
    # racing claim: another writer commits the instant BETWEEN this
    # writer's timeline read and its O_EXCL claim — simulate with a
    # stale timeline view; the loser must not clobber and must unlink
    # its staged files
    import kafka_connect_expand_json_transform_spark.sources.hudi_reader as HR

    nxt = str(int(i2) + 1)
    open(os.path.join(root, ".hoodie", f"{nxt}.commit"), "w").close()
    real = HR.hudi_timeline
    monkeypatch.setattr(
        HR, "hudi_timeline",
        lambda p: [c for c in real(p) if c["instant"] != nxt],
    )
    with pytest.raises(HudiCommitConflict):
        HR.hudi_append(df1.coalesce(1), root, record_key="k", instant=nxt)
    monkeypatch.setattr(HR, "hudi_timeline", real)
    # no partial files leaked by the loser
    import glob as _glob
    leaked = [p for p in _glob.glob(os.path.join(root, "p", "*.parquet"))
              if f"_{nxt}." in p]
    assert leaked == []


def test_hudi_upsert_roundtrip(spark, tmp_path):
    # r10: CoW upsert — existing keys rewrite their file group's newest
    # slice at the new instant (carried rows keep their ORIGINAL
    # _hoodie_commit_time), unseen keys insert into new groups; time
    # travel and incremental queries see exactly Hudi's contract
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        hudi_append,
        hudi_upsert,
        read_hudi,
        read_hudi_incremental,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "hu")
    df1 = spark.range(0, 6).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("v"))
    i1 = hudi_append(df1.coalesce(2), root, record_key="k")
    # update k in {1, 4} (two different file groups), insert k in {6, 7}
    batch = spark.createDataFrame(
        [(1, 100), (4, 400), (6, 600), (7, 700)], "k long, v long"
    )
    i2 = hudi_upsert(batch, root, record_key="k",
                     instant=str(int(i1) + 1000))
    got = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert got == {0: 0, 1: 100, 2: 4, 3: 6, 4: 400, 5: 10,
                   6: 600, 7: 700}
    # time travel: pre-upsert state intact
    old = {r.k: r.v for r in
           read_hudi(spark, root, as_of_instant=i1).collect()}
    assert old == {k: 2 * k for k in range(6)}
    # carried rows keep their original commit time; changed rows carry i2
    kept = read_hudi(spark, root, keep_meta=True)
    by_k = {r.k: r._hoodie_commit_time for r in kept.collect()}
    assert by_k[0] == i1 and by_k[5] == i1
    assert {by_k[1], by_k[4], by_k[6], by_k[7]} == {i2}
    # incremental (i1, i2]: exactly the changed/inserted rows
    inc = {r.k: r.v for r in
           read_hudi_incremental(spark, root, i1, i2).collect()}
    assert inc == {1: 100, 4: 400, 6: 600, 7: 700}
    # a second upsert touching one group only
    i3 = hudi_upsert(
        spark.createDataFrame([(0, -1)], "k long, v long"), root,
        record_key="k", instant=str(int(i2) + 1000),
    )
    got3 = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert got3[0] == -1 and got3[1] == 100 and len(got3) == 8
    # duplicate keys in one batch refuse
    dup = spark.createDataFrame([(9, 1), (9, 2)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate record keys"):
        hudi_upsert(dup, root, record_key="k")
    # upsert on an empty table is an insert-only append
    root2 = str(tmp_path / "hu2")
    j1 = hudi_upsert(df1.coalesce(1), root2, record_key="k")
    assert sorted(r.k for r in read_hudi(spark, root2).collect()) \
        == list(range(6))
    assert j1 is not None


def test_hudistream_mor_commits(spark, tmp_path):
    # r10: hudistream over MERGE_ON_READ — each micro-batch merges the
    # commit's touched file groups at that instant (slice-local, the
    # batch reader's own merge) and keeps the rows that commit wrote:
    # C1 emits the base rows, C2 (deltacommit) emits the update (1 ->
    # v1b) and the insert (5); the delete of 2 drops out — exactly the
    # read_hudi_incremental contract, streamed
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        read_hudi_incremental,
        register_hudi_stream_source,
    )

    root, _log = _mor_table(tmp_path)
    register_hudi_stream_source(spark)
    q = (
        spark.readStream.format("hudistream").option("path", root).load()
        .writeStream.format("memory").queryName("sg_hudistream_mor")
        .outputMode("append").start()
    )
    _drain_q(q)
    assert q.exception() is None
    got = sorted((r.id, r.v)
                 for r in spark.table("sg_hudistream_mor").collect())
    assert got == [(1, "v1"), (1, "v1b"), (2, "v2"), (3, "v3"),
                   (5, "v5")]
    # the C2 micro-batch equals the incremental read over (C1, C2]
    inc = sorted(
        (r.id, r.v)
        for r in read_hudi_incremental(spark, root, C1).collect()
    )
    assert inc == [(1, "v1b"), (5, "v5")]


def test_hudi_mor_upsert_log_blocks(spark, tmp_path):
    # r10: the MoR WRITE path — updates/deletes append log blocks to
    # the touched file groups (written executor-side, one log per
    # group), inserts land as new base parquet groups, all under one
    # deltacommit; the repo's own MoR merge is the independent check
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        hudi_mor_upsert,
        read_hudi,
        read_hudi_incremental,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "morw")
    base = spark.range(0, 6).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("v"))
    i1 = hudi_mor_upsert(base.coalesce(2), root, record_key="k")
    assert sorted((r.k, r.v) for r in read_hudi(spark, root).collect()) \
        == [(k, 2 * k) for k in range(6)]
    # update 1 and 4 (different groups possible), insert 9, delete 5
    batch = spark.createDataFrame([(1, 100), (4, 400), (9, 900)],
                                  "k long, v long")
    i2 = hudi_mor_upsert(batch, root, record_key="k",
                         delete_keys=[5, 777],  # 777 absent: no-op
                         instant=str(int(i1) + 1000))
    got = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert got == {0: 0, 1: 100, 2: 4, 3: 6, 4: 400, 9: 900}
    # log files exist (not a rewrite): base files of i1 unchanged
    import glob as _glob

    logs = _glob.glob(os.path.join(root, "p", ".*log*"))
    assert logs, "expected log files"
    # time travel to i1
    old = {r.k: r.v for r in
           read_hudi(spark, root, as_of_instant=i1).collect()}
    assert old == {k: 2 * k for k in range(6)}
    # incremental (i1, i2]: updates + inserts surface, deletes drop out
    inc = {r.k: r.v for r in
           read_hudi_incremental(spark, root, i1, i2).collect()}
    assert inc == {1: 100, 4: 400, 9: 900}
    # a second round of log appends stacks on the same slices
    i3 = hudi_mor_upsert(
        spark.createDataFrame([(1, -1)], "k long, v long"), root,
        record_key="k", instant=str(int(i2) + 1000),
    )
    got3 = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert got3[1] == -1 and got3[4] == 400 and len(got3) == 6
    # duplicate batch keys refuse; CoW tables refuse
    dup = spark.createDataFrame([(7, 1), (7, 2)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate"):
        hudi_mor_upsert(dup, root, record_key="k")
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        hudi_append,
    )

    cow = str(tmp_path / "coww")
    hudi_append(base.coalesce(1), cow, record_key="k")
    with pytest.raises(HudiUnsupported, match="MERGE_ON_READ"):
        hudi_mor_upsert(batch, cow, record_key="k")
    # unsupported column types refuse
    arr = spark.range(1).select(F.col("id").alias("k"),
                                F.array(F.lit(1)).alias("v"))
    with pytest.raises(HudiUnsupported, match="log-encodable"):
        hudi_mor_upsert(arr, root, record_key="k")


def test_hudi_compact_materializes_logs(spark, tmp_path):
    # r10: compaction merges log-bearing slices into new base files at
    # the compaction instant; snapshot reads stop paying the log merge,
    # time travel still works, and a pure compaction contributes no
    # phantom rows to incremental/streaming reads (merged rows keep
    # their ORIGINAL commit times)
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        hudi_compact,
        hudi_mor_upsert,
        read_hudi,
        read_hudi_incremental,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "cmp")
    base = spark.range(0, 6).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("v"))
    i1 = hudi_mor_upsert(base.coalesce(2), root, record_key="k")
    i2 = hudi_mor_upsert(
        spark.createDataFrame([(1, 100), (9, 900)], "k long, v long"),
        root, record_key="k", delete_keys=[5],
        instant=str(int(i1) + 1000),
    )
    pre = {r.k: r.v for r in read_hudi(spark, root).collect()}
    i3 = hudi_compact(spark, root, instant=str(int(i2) + 1000))
    post = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert post == pre == {0: 0, 1: 100, 2: 4, 3: 6, 4: 8, 9: 900}
    # the merged slices now read from the compaction's base files; the
    # newest slice per compacted group has no logs
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        _mor_slices,
    )

    for sl in _mor_slices(root, None):
        assert not sl["logs"], sl
    # time travel to pre-compaction instants still merges the old slices
    assert {r.k: r.v for r in
            read_hudi(spark, root, as_of_instant=i1).collect()} \
        == {k: 2 * k for k in range(6)}
    # a pure compaction adds nothing to the incremental range (i2, i3]:
    # rows keep their original commit times, so the commit-time filter
    # yields zero rows even though the compaction touched every group
    assert read_hudi_incremental(spark, root, i2, i3).count() == 0
    # post-compaction writes stack on the new bases
    i4 = hudi_mor_upsert(
        spark.createDataFrame([(0, -1)], "k long, v long"), root,
        record_key="k", instant=str(int(i3) + 1000),
    )
    got = {r.k: r.v for r in read_hudi(spark, root).collect()}
    assert got[0] == -1 and len(got) == 6


def test_hudi_clean_keeps_latest_versions(spark, tmp_path):
    # r10: the clean service — older file slices per group are deleted,
    # the head still reads, time travel to cleaned instants fails
    # loudly (missing file), dry_run only lists
    from kafka_connect_expand_json_transform_spark.sources.hudi_reader import (
        hudi_append,
        hudi_clean,
        hudi_upsert,
        read_hudi,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "cln")
    base = spark.range(0, 6).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("v"))
    i1 = hudi_append(base.coalesce(1), root, record_key="k")
    i2 = hudi_upsert(
        spark.createDataFrame([(1, 100)], "k long, v long"), root,
        record_key="k", instant=str(int(i1) + 1000),
    )
    i3 = hudi_upsert(
        spark.createDataFrame([(2, 200)], "k long, v long"), root,
        record_key="k", instant=str(int(i2) + 1000),
    )
    head = {r.k: r.v for r in read_hudi(spark, root).collect()}
    cand = hudi_clean(root, keep_last=1, dry_run=True)
    assert cand  # the i1/i2 slices of the rewritten group
    assert all(os.path.exists(os.path.join(root, r)) for r in cand)
    removed = hudi_clean(root, keep_last=1)
    assert sorted(removed) == sorted(cand)
    # head unaffected
    assert {r.k: r.v for r in read_hudi(spark, root).collect()} == head
    # time travel to a cleaned slice now fails loudly
    with pytest.raises(Exception):
        read_hudi(spark, root, as_of_instant=i1).collect()
    # keep_last=2 after three versions: nothing left to clean
    assert hudi_clean(root, keep_last=2) == []
