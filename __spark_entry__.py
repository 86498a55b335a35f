"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query definitions live in ``kafka_connect_expand_json_transform_spark.plans.queries``
(one registry entry per implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: expand events.props JSON
    into typed structs (the reference SMT's job, ExpandJson.java:86-129) and
    aggregate over the expanded field."""
    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES

    return QUERIES["expand_props_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kafka_connect_expand_json_transform_spark.plans.queries import ORACLES

    return dict(ORACLES)
