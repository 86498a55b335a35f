"""Streaming ``expand_json`` — the reference SMT's actual deployment shape:
a JSON-expansion step inside a running stream pipeline (ExpandJson.java:32,
readme.md:38-42).

A streaming DataFrame cannot be sampled at plan time, so the ``sample``
inference strategy (SURVEY.md §1.5) takes its sample from a *static* batch
DataFrame (e.g. a parquet snapshot of the same topic) — the honest,
plan-time-resolved version of the reference's first-record schema freeze
(ExpandJson.java:131-153). ``static`` and ``variant`` strategies pass through
unchanged: both are already plan-time-safe.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import DataType

from kafka_connect_expand_json_transform_spark.operators.expand_json import expand_json
from kafka_connect_expand_json_transform_spark.schema_inference import (
    infer_schema_for_column,
)


def expand_json_stream(
    df: DataFrame,
    fields: Sequence[str] | None = None,
    source_column: str | None = None,
    schema: DataType | Mapping[str, DataType] | None = None,
    infer: str = "sample",
    sample_df: DataFrame | None = None,
    sample_limit: int = 1000,
    mode: str = "PERMISSIVE",
    schema_name_prefix: str | None = None,
) -> DataFrame:
    """``expand_json`` for streaming DataFrames.

    ``infer="sample"`` requires ``sample_df``: a batch DataFrame with the same
    JSON columns, from which schemas are inferred once at plan time. An
    explicit ``schema=`` short-circuits inference entirely (static).
    """
    if schema is not None:
        infer = "static"
    elif infer == "sample":
        if sample_df is None:
            raise ValueError(
                "streaming expand_json with infer='sample' needs sample_df= "
                "(a batch snapshot to infer from) or an explicit schema="
            )
        targets = list(fields) if fields else [source_column or "value"]
        schema = {
            f: infer_schema_for_column(sample_df, f, sample_limit=sample_limit)
            for f in targets
        }
        infer = "static"
    return expand_json(
        df,
        fields=fields,
        source_column=source_column,
        schema=schema,
        infer=infer,
        mode=mode,
        schema_name_prefix=schema_name_prefix,
    )
