"""Txlog table-format semantics: versioned snapshots, time travel, schema
enforcement, optimistic-concurrency conflicts, atomic commit layout."""

import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.sources import txlog


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_append_versions_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = txlog.append_table(_df(spark, 0, 10), root)
    v1 = txlog.append_table(_df(spark, 10, 30), root)
    assert (v0, v1) == (0, 1)
    assert txlog.read_table(spark, root).count() == 30
    assert txlog.read_table(spark, root, version=0).count() == 10
    assert txlog.latest_version(root) == 1
    assert [h["op"] for h in txlog.history(root)] == ["append", "append"]


def test_overwrite_resets_file_set(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append_table(_df(spark, 0, 10), root)
    txlog.append_table(_df(spark, 10, 20), root)
    txlog.overwrite_table(_df(spark, 100, 105), root)
    assert txlog.read_table(spark, root).count() == 5
    # history is preserved: the pre-overwrite snapshot still reads fully
    assert txlog.read_table(spark, root, version=1).count() == 20


def test_append_schema_enforced_overwrite_may_change(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append_table(_df(spark, 0, 5), root)
    other = spark.range(5).select(F.col("id").cast("string").alias("s"))
    with pytest.raises(txlog.TxLogSchemaMismatch):
        txlog.append_table(other, root)
    txlog.overwrite_table(other, root)  # overwrite may evolve the schema
    assert txlog.read_table(spark, root).columns == ["s"]


def test_optimistic_concurrency_conflict(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.append_table(_df(spark, 0, 5), root)
    # writer A read at version 0; writer B commits version 1 first
    txlog.append_table(_df(spark, 5, 10), root)
    with pytest.raises(txlog.TxLogConflict):
        txlog.append_table(_df(spark, 10, 15), root, expected_version=0)
    # raced claim on the same version number also conflicts
    claim = os.path.join(root, "_log", "00000002.json")
    os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    with pytest.raises(txlog.TxLogConflict):
        txlog.append_table(_df(spark, 10, 15), root)


def test_reading_future_or_missing_table_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        txlog.read_table(spark, root)
    txlog.append_table(_df(spark, 0, 5), root)
    with pytest.raises(ValueError):
        txlog.read_table(spark, root, version=7)


def test_snapshot_scan_keeps_pushdown(spark, tmp_path):
    """The snapshot is a plain parquet scan: predicate pushdown survives."""
    root = str(tmp_path / "t")
    txlog.append_table(_df(spark, 0, 1000), root)
    df = txlog.read_table(spark, root).where(F.col("id") < 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(id,10)" in plan
