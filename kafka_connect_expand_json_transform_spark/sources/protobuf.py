"""Protobuf wire-format expansion — [EXT] gated like Avro (sources/avro.py).

pyspark ships ``pyspark.sql.protobuf.functions.from_protobuf/to_protobuf``,
but the implementing ``spark-protobuf`` DataSource is an EXTERNAL module
(jar not bundled); calling the functions without it fails at analysis with
``PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE``.  Same shape as the Avro
gate:

* ``protobuf_available(spark)`` — one cheap analysis-time probe, cached
  per session.
* ``expand_protobuf(df, col, message_name, desc_file)`` — from_protobuf
  projection when the module is loaded, ``ProtobufNotLoaded`` (with the
  spark-submit hint) otherwise — never a deep Py4J stack from inside a
  job.
* ``to_protobuf_column(col, message_name, desc_file)`` — serialize side.

On a real cluster add ``--packages
org.apache.spark:spark-protobuf_2.13:<ver>`` and the same call sites light
up; the plan shape is identical to the JSON/Avro cores (narrow codegen
projection, no UDF).

Like Avro, the format also has a jar-free pure-Python twin
(``sources/protobuf_codec.py`` — the public wire-format spec on the
stdlib, descriptors parsed from ``.proto`` text), surfaced here as
Arrow-batched ``mapInPandas`` UDFs:

* ``protobuf_frame_udf(schema_id, proto_text, message)`` — struct rows ->
  Confluent-framed protobuf wire bytes (the ProtobufConverter produce side);
* ``protobuf_unframe_udf(registry)`` — wire bytes -> columns, with the
  registry-lookup fail-fast and message-index resolution a real
  deserializer performs.

At 100 TB the jar path is the fast lane (JVM, codegen); the twin keeps the
format functionally covered and byte-compatible in jar-less environments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_PROBE: dict[int, bool] = {}


class ProtobufNotLoaded(RuntimeError):
    """spark-protobuf is not on the classpath; add the external module."""


def protobuf_available(spark: SparkSession) -> bool:
    """True when the spark-protobuf module is loaded (probed once per
    session with a 1-row analysis-only check)."""
    key = id(spark)
    if key not in _PROBE:
        try:
            from pyspark.sql.protobuf.functions import to_protobuf

            # analysis-only: schema resolution raises the NOT_LOADED error
            # when the jar is absent; no job runs either way
            spark.range(1).select(
                to_protobuf(F.struct(F.col("id")), "probe", b"")
            ).schema
            _PROBE[key] = True
        except Exception:
            _PROBE[key] = False
    return _PROBE[key]


def expand_protobuf(
    df: DataFrame,
    column: str,
    message_name: str,
    desc_file_path: str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Expand a binary protobuf column into a typed struct (the JSON
    core's plan shape, different wire format).  Raises ProtobufNotLoaded
    with the actionable hint when the external module is absent."""
    spark = df.sparkSession
    if not protobuf_available(spark):
        raise ProtobufNotLoaded(
            "spark-protobuf is an external module: restart with "
            "--packages org.apache.spark:spark-protobuf_2.13:<spark version>"
        )
    from pyspark.sql.protobuf.functions import from_protobuf

    return df.withColumn(
        column,
        from_protobuf(F.col(column), message_name, desc_file_path, options),
    )


def to_protobuf_column(
    col: Column | str,
    message_name: str,
    desc_file_path: str | None = None,
    options: dict | None = None,
) -> Column:
    """to_protobuf as a Column (serialize side).  Caller must have
    verified ``protobuf_available``; kept thin so the import error
    surfaces once."""
    from pyspark.sql.protobuf.functions import to_protobuf

    c = F.col(col) if isinstance(col, str) else col
    return to_protobuf(c, message_name, desc_file_path, options)


# --- jar-free pure-Python twin (protobuf_codec) ------------------------------


def protobuf_frame_udf(schema_id: int, proto_text: str, message: str):
    """Return a ``mapInPandas``-ready function encoding struct rows into
    Confluent-framed protobuf wire bytes (column ``wire`` binary) — the
    ProtobufConverter produce side, Arrow-batched (one Python call per
    batch, codec per row).  ``message`` is the (package-qualified or bare
    top-level) message name inside ``proto_text``."""
    import pandas as pd

    from kafka_connect_expand_json_transform_spark.sources import protobuf_codec as PC

    types = PC.parse_proto(proto_text)
    order = PC.top_level_messages(proto_text, types)
    fq = message if message in types else next(n for n in order if n.endswith("." + message) or n == message)
    desc = types[fq]
    indexes = [order.index(fq)]
    fields = [f["name"] for f in desc["fields"]]

    def frame(batches):
        for pdf in batches:
            out = []
            for row in pdf[fields].itertuples(index=False):
                payload = PC.encode_message(desc, dict(zip(fields, row)), types)
                out.append(PC.frame_confluent_protobuf(schema_id, indexes, payload))
            yield pd.DataFrame({"wire": out})

    return frame


def protobuf_unframe_udf(registry: dict[int, str]):
    """Return a ``mapInPandas``-ready function decoding Confluent-framed
    protobuf wire bytes back into columns (the consume-side
    ProtobufConverter role): validates the magic byte, resolves the 4-byte
    schema id against ``registry`` (id -> proto text; unknown ids raise),
    walks the message-indexes array to the right descriptor, and decodes
    the payload with the pure-stdlib codec.  Output columns follow the
    resolved message's field order with proto3 defaults filled."""
    import pandas as pd

    from kafka_connect_expand_json_transform_spark.sources import protobuf_codec as PC

    def unframe(batches):
        parsed: dict[int, tuple] = {}
        for pdf in batches:
            rows = []
            for wire in pdf["wire"]:
                w = bytes(wire)
                sid, indexes, payload = PC.unframe_confluent_protobuf(w)
                if sid not in registry:
                    raise KeyError(f"schema id {sid} not in registry")
                if sid not in parsed:
                    types = PC.parse_proto(registry[sid])
                    parsed[sid] = (types, PC.top_level_messages(registry[sid], types))
                types, order = parsed[sid]
                desc = PC.message_by_indexes(types, order, indexes)
                rows.append(PC.decode_message(payload, desc, types))
            yield pd.DataFrame(rows)

    return unframe
