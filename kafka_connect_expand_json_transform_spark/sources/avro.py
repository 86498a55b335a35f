"""Avro wire-format expansion — [EXT] the gated sibling of the JSON core
(from_json), XML (from_xml), and CSV (from_csv) expansion paths.

pyspark ships ``pyspark.sql.avro.functions.from_avro/to_avro``, but the
implementing ``spark-avro`` DataSource is an EXTERNAL module (jar not
bundled with the distribution); calling the functions without it fails at
analysis with ``AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE``.  This module
wraps that capability probe so pipelines can declare Avro expansion and
degrade explicitly:

* ``avro_available(spark)`` — one cheap analysis-time probe, cached.
* ``expand_avro(df, col, schema_json)`` — from_avro projection when the
  module is loaded, ``AvroNotLoaded`` (with the spark-submit hint)
  otherwise — never a deep Py4J stack from inside a job.

On a real cluster add ``--packages org.apache.spark:spark-avro_2.13:<ver>``
and the same call sites light up; the plan shape is identical to the JSON
core (narrow codegen projection, no UDF).

When the jar is absent, the format is NOT unreachable: ``sources/avro_py``
ships a pure-stdlib implementation of the Avro spec — container-file
read/write as a Python DataSource (``avro_py``) and a wire-format
``expand_avro_py`` (Arrow-batched mapInPandas) with this module's same
PERMISSIVE/FAILFAST contract.  Slower than codegen, dependency-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_PROBE: dict[int, bool] = {}


class AvroNotLoaded(RuntimeError):
    """spark-avro is not on the classpath; add the external module."""


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro module is loaded (probed once per
    session with a 1-row analysis-only check)."""
    key = id(spark)
    if key not in _PROBE:
        try:
            from pyspark.sql.avro.functions import to_avro

            spark.range(1).select(to_avro(F.col("id"))).schema
            _PROBE[key] = True
        except Exception:
            _PROBE[key] = False
    return _PROBE[key]


def expand_avro(df: DataFrame, column: str, schema_json: str) -> DataFrame:
    """Expand a binary Avro column into a typed struct (the JSON core's
    plan shape, different wire format). Raises AvroNotLoaded with the
    actionable hint when the external module is absent."""
    spark = df.sparkSession
    if not avro_available(spark):
        raise AvroNotLoaded(
            "spark-avro is an external module: restart with "
            "--packages org.apache.spark:spark-avro_2.13:<spark version>"
        )
    from pyspark.sql.avro.functions import from_avro

    return df.withColumn(column, from_avro(F.col(column), schema_json))


def to_avro_column(col: Column | str, schema_json: str | None = None) -> Column:
    """to_avro as a Column (serialize side). Caller must have verified
    ``avro_available``; kept thin so the import error surfaces once."""
    from pyspark.sql.avro.functions import to_avro

    c = F.col(col) if isinstance(col, str) else col
    return to_avro(c, schema_json) if schema_json else to_avro(c)
