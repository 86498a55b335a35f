"""Debezium change-data-capture envelope support — the canonical Kafka
Connect SOURCE ecosystem the reference's SMT runs inside (readme.md:16
places ExpandJson in a Connect worker; Debezium connectors are the
dominant producers of the records such workers transform).

Public semantics only (debezium.io docs, "Debezium connector record
structure"): every change event value is an ENVELOPE struct

    {before, after, source {connector, db, table, ts_ms, lsn, ...},
     op ('c'|'u'|'d'|'r'), ts_ms}

serialized by the worker's converter (JsonConverter here — the same two
regimes as the reference: payload-only, or ``schemas.enable`` wrapping).

Pieces:

* ``debezium_envelope_schema(row_schema)`` — the typed envelope
  StructType for a given table row schema;
* ``from_debezium(df, ...)`` — JSON text/bytes -> typed envelope column
  (one ``from_json`` projection, codegen; ``schemas.enable=true`` inputs
  take one extra ``get_json_object`` hop to peel the payload);
* ``latest_changes(df, keys, ...)`` — collapse a CDC batch to the last
  change per key (key-partitioned rank, never a global window);
* ``apply_cdc(spark, root, changes, keys)`` — upsert/delete the reduced
  batch into a txlog table via ``merge_into`` (partial CoW, optimistic
  concurrency) — the foreachBatch body of a streaming CDC sink.

The unwrap step itself is the ``ExtractNewRecordState`` SMT
(operators/connect_smt.py), chained exactly as a real
``transforms=unwrap`` connector config would.

Scale: decode and unwrap are narrow codegen projections; the per-key
reduce shuffles on the table key (the partitioning the merge join reuses);
``merge_into`` broadcasts small CDC batches and prunes non-overlapping
files, so a 100 TB table pays for the touched key range, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: source-block fields every Debezium connector populates (a subset —
#: connectors add engine-specific fields; unknown keys are simply absent)
DEFAULT_SOURCE_FIELDS: tuple[tuple[str, T.DataType], ...] = (
    ("connector", T.StringType()),
    ("db", T.StringType()),
    ("table", T.StringType()),
    ("ts_ms", T.LongType()),
    ("lsn", T.LongType()),
)


def debezium_envelope_schema(
    row_schema: T.StructType,
    source_fields: tuple[tuple[str, T.DataType], ...] = DEFAULT_SOURCE_FIELDS,
) -> T.StructType:
    """The typed Debezium envelope for a table whose rows have
    ``row_schema`` (before/after share it; deletes carry after=null)."""
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField(
                "source",
                T.StructType([T.StructField(n, t, True) for n, t in source_fields]),
                True,
            ),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def from_debezium(
    df: DataFrame,
    row_schema: T.StructType,
    column: str = "value",
    *,
    schemas_enable: bool = False,
    mode: str = "PERMISSIVE",
    source_fields: tuple[tuple[str, T.DataType], ...] = DEFAULT_SOURCE_FIELDS,
) -> DataFrame:
    """Replace JSON-text/bytes ``column`` with the typed Debezium envelope
    struct.  ``schemas_enable=True`` peels the JsonConverter
    ``{schema, payload}`` wrapper first (same envelope regime the
    reference's readme documents for its own input).  Tombstones (null
    input) stay null.  One narrow projection either way."""
    src = F.col(column).cast("string")
    if schemas_enable:
        src = F.get_json_object(src, "$.payload")
    env = F.from_json(src, debezium_envelope_schema(row_schema, source_fields),
                      {"mode": mode})
    # tombstones (null input) stay null: from_json propagates null input
    return df.withColumn(column, env)


def latest_changes(
    df: DataFrame,
    keys: list[str],
    *,
    order_by: list[str] = ("__ts_ms", "__lsn"),
) -> DataFrame:
    """Collapse an unwrapped CDC batch (ExtractNewRecordState output plus
    ``add.fields`` metadata like __ts_ms/__lsn) to the LAST change per key
    — the reduce every CDC-apply performs so one merge sees one row per
    key.  Key-partitioned ``row_number`` (shuffles on the table key, the
    same partitioning the merge join consumes); never a global sort.

    Determinism contract: ``order_by`` must TOTALLY order each key's
    changes — include the source's position column (Debezium's ``lsn`` /
    binlog position, which real connectors guarantee unique per source)
    as the final key; rows tied on every order_by column are broken
    arbitrarily and would make the surviving row engine-dependent."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    keys: list[str],
    *,
    op_column: str = "__op",
    order_by: list[str] = ("__ts_ms", "__lsn"),
    reduce: bool = True,
    **merge_kwargs,
) -> tuple[int, dict]:
    """Apply an unwrapped CDC batch to the txlog table at ``root``:
    reduce to the latest change per key, then one MERGE — delete where the
    surviving op is 'd', upsert otherwise.  This is the foreachBatch body
    of a streaming Debezium sink; exactly-once comes from the txlog's
    optimistic commit + the stream's checkpoint replay, the same contract
    the repo's other foreachBatch sinks document.  ``reduce=False`` skips
    the per-key rank when the producer guarantees one event per key per
    batch (e.g. a compacted topic); the merge's duplicate-key guard still
    fail-fasts if that promise is broken."""
    last = changes
    if reduce:
        last = latest_changes(changes, keys, order_by=list(order_by))
    # one consumer-side materialization: the merge runs several actions
    # (dup-key guard, clause stats, CoW write, change capture) and must not
    # re-execute the decode->unwrap->reduce lineage for each — the reduced
    # batch is CDC-batch-sized (one row per touched key), never table-sized
    last = last.localCheckpoint(eager=False)
    from kafka_connect_expand_json_transform_spark.sources import txlog as TX

    # deleted rows carry their final state in `before` (rewrite mode), so
    # the merge's delete clause sees the key; metadata columns are dropped
    # by merge_into's source-columns-not-in-target rule
    return TX.merge_into(
        spark,
        root,
        last,
        on=keys,
        update="all",
        delete_when=f"s.{op_column} = 'd'",
        insert=True,
        # a delete whose key is already absent is a no-op, never a
        # resurrection of the `before` state (WHEN NOT MATCHED AND <cond>)
        insert_when=f"s.{op_column} <> 'd'",
        **merge_kwargs,  # e.g. capture_changes / prune_files passthrough
    )
