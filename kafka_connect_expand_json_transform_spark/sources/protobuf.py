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
projection, no UDF).  Unlike Avro there is no pure-Python fallback here —
protobuf decoding needs the message descriptor machinery, so the honest
degraded mode is the explicit error, not a slow twin.
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
