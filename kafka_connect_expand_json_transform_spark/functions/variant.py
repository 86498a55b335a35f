"""VariantType helpers — the ``variant`` inference strategy's query surface
(SURVEY.md §1.5: per-record dynamic typing, the only faithful analogue of the
reference's per-record schema inference at scale; §2.2 lists ``parse_json``,
``variant_get``, ``schema_of_variant`` as the primitives).

All thin wrappers over Spark 4 built-ins, collected so the engine's variant
path is one import.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_variant(col: Column | str) -> Column:
    """JSON text -> VariantType (per-record typed, schema-free)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_json(c.cast("string"))


def variant_get(col: Column | str, path: str, as_type: str = "string") -> Column:
    """Typed extraction from a variant; errors on type mismatch
    (the FAILFAST analogue)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.variant_get(c, path, as_type)


def try_variant_get(col: Column | str, path: str, as_type: str = "string") -> Column:
    """Null-on-mismatch extraction (the PERMISSIVE analogue)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_variant_get(c, path, as_type)


def variant_schema(col: Column | str) -> Column:
    """Per-record inferred schema DDL of a variant value — the observable
    twin of the reference's per-record ``inferSchema`` (ExpandJson.java:191)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.schema_of_variant(c)


def variant_schema_agg(df: DataFrame, col: str) -> str | None:
    """Merged schema DDL across all rows (``schema_of_variant_agg``) — the
    distributed, exact version of sampling-based inference: one aggregation,
    no driver-side collect.

    ``col`` holds JSON text (parsed here); pass a column that is already
    VariantType through ``F.schema_of_variant_agg`` directly to avoid the
    re-parse. Returns None on an empty frame.
    """
    dt = df.schema[col].dataType.simpleString()
    v = F.col(col) if dt == "variant" else to_variant(col)
    return df.select(F.schema_of_variant_agg(v).alias("s")).first()["s"]
