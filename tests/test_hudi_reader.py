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


def test_mor_fail_closed(spark, tmp_path):
    root = _table(tmp_path, ttype="MERGE_ON_READ")
    with pytest.raises(HudiUnsupported, match="MERGE_ON_READ"):
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
