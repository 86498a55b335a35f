"""JSON -> Spark schema inference with the reference's KIP-301-style rules.

Reference: ``ExpandJson.inferSchema`` (ExpandJson.java:191-258), readme.md:3.
Rule table (SURVEY.md §1.3) — every inferred field/type is nullable
(ExpandJson.java:36,188,221,231):

  JSON null      -> string                       (ExpandJson.java:193-194)
  JSON boolean   -> boolean                      (ExpandJson.java:196-197)
  JSON integral  -> int if it fits 32 bits       (ExpandJson.java:203-206)
                    bigint if it fits 64 bits    (ExpandJson.java:208-209)
                    string beyond 64 bits        (ExpandJson.java:201-202)
  JSON floating  -> double                       (ExpandJson.java:211-216)
  JSON array     -> array<infer(first element)>  (ExpandJson.java:219-222)
                    empty array -> array<string>
  JSON object    -> struct, field order = key order (ExpandJson.java:224-247)
  JSON string    -> string                       (ExpandJson.java:249-250)

The reference infers per record and freezes the output schema on the first
record per input schema (LRU cache, ExpandJson.java:73,81,131-134).  Spark
resolves schemas at plan time, so this module offers the three honest
strategies (SURVEY.md §1.5):

  * ``sample``  — infer from a bounded sample of the column, merging
                  per-record schemas with deterministic widening rules.
  * ``static``  — caller supplies the schema; no inference.
  * ``variant`` — per-record dynamic typing via ``parse_json`` ->
                  ``VariantType`` (handled in ``operators.expand_json``).

Scale note: ``sample`` collects at most ``sample_limit`` strings to the
driver (a few MB) — the inference itself is O(sample), never O(data).  For
truly wide/dynamic data use ``strategy="variant"`` or pass a static schema.
"""

from __future__ import annotations

import decimal
import json
from typing import Any, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
)

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1
_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


def _infer_node(node: Any, first_element_only: bool = True) -> DataType:
    """Infer the Spark type of one parsed JSON value, reference rules.

    ``NullType`` is used as an internal sentinel for JSON null / empty array
    elements so that merging across sampled records can widen it; callers get
    the reference's null->string behavior from :func:`finalize_type`.
    """
    if node is None:
        return NullType()
    if isinstance(node, bool):  # bool before int: bool is an int subclass
        return BooleanType()
    if isinstance(node, int):
        if _INT32_MIN <= node <= _INT32_MAX:
            return IntegerType()
        if _INT64_MIN <= node <= _INT64_MAX:
            return LongType()
        # > 64 bits: the reference stringifies (ExpandJson.java:201-202)
        return StringType()
    if isinstance(node, decimal.Decimal):
        # BigDecimal -> string (ExpandJson.java:212-213).  A Decimal node only
        # appears when the caller parsed with decimal_fidelity=True — the
        # analogue of Jackson's USE_BIG_DECIMAL_FOR_FLOATS, without which the
        # reference's own readTree yields DoubleNode and the string branch
        # never fires.
        return StringType()
    if isinstance(node, float):
        return DoubleType()
    if isinstance(node, str):
        return StringType()
    if isinstance(node, list):
        if not node:
            # empty array -> array<string> (ExpandJson.java:220-221)
            return ArrayType(NullType(), containsNull=True)
        if first_element_only:
            # reference rule: only the first element decides the element type
            # (ExpandJson.java:222) — heterogeneous arrays mis-typed on purpose
            elem = _infer_node(node[0], first_element_only)
        else:
            elem = NullType()
            for item in node:
                elem = merge_types(elem, _infer_node(item, first_element_only))
        return ArrayType(elem, containsNull=True)
    if isinstance(node, dict):
        fields = [
            StructField(str(k), _infer_node(v, first_element_only), nullable=True)
            for k, v in node.items()  # field order = JSON key order
        ]
        return StructType(fields)
    raise TypeError(f"unsupported JSON node type: {type(node)!r}")


def merge_types(a: DataType, b: DataType) -> DataType:
    """Widen two inferred types from different sampled records.

    Deterministic lattice: null < anything; int < bigint < double;
    struct fields union by name (first-seen order); arrays merge elementwise;
    any other conflict widens to string (the reference's own catch-all type).
    """
    if isinstance(a, NullType):
        return b
    if isinstance(b, NullType):
        return a
    if a == b:
        return a
    def rank(t: DataType) -> int | None:
        if isinstance(t, IntegerType):
            return 0
        if isinstance(t, LongType):
            return 1
        if isinstance(t, DoubleType):
            return 2
        return None

    ra, rb = rank(a), rank(b)
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    if isinstance(a, ArrayType) and isinstance(b, ArrayType):
        return ArrayType(merge_types(a.elementType, b.elementType), containsNull=True)
    if isinstance(a, StructType) and isinstance(b, StructType):
        out: list[StructField] = []
        b_fields = {f.name: f for f in b.fields}
        seen = set()
        for f in a.fields:
            seen.add(f.name)
            if f.name in b_fields:
                out.append(
                    StructField(
                        f.name,
                        merge_types(f.dataType, b_fields[f.name].dataType),
                        nullable=True,
                    )
                )
            else:
                out.append(StructField(f.name, f.dataType, nullable=True))
        for f in b.fields:
            if f.name not in seen:
                out.append(StructField(f.name, f.dataType, nullable=True))
        return StructType(out)
    return StringType()


def finalize_type(dtype: DataType) -> DataType:
    """Replace internal NullType sentinels with the reference's string default
    (JSON null -> string, empty array -> array<string>)."""
    if isinstance(dtype, NullType):
        return StringType()
    if isinstance(dtype, ArrayType):
        return ArrayType(finalize_type(dtype.elementType), containsNull=True)
    if isinstance(dtype, StructType):
        return StructType(
            [
                StructField(f.name, finalize_type(f.dataType), nullable=True, metadata=f.metadata)
                for f in dtype.fields
            ]
        )
    return dtype


def _loads(text: str, decimal_fidelity: bool) -> Any:
    if decimal_fidelity:
        return json.loads(text, parse_float=decimal.Decimal)
    return json.loads(text)


def infer_schema_for_json(
    text: str, first_element_only: bool = True, decimal_fidelity: bool = False
) -> DataType:
    """Per-record inference, bit-faithful to the reference's rule table.

    ``infer_schema_for_json('{"a": 42}')`` ->
    ``StructType([StructField("a", IntegerType())])``

    ``decimal_fidelity=True`` parses JSON floats as ``decimal.Decimal`` so the
    reference's BigDecimal -> string rule (ExpandJson.java:212-213) applies:
    high-precision decimal text keeps every digit by landing in a string
    field instead of being rounded through a double.
    """
    return finalize_type(_infer_node(_loads(text, decimal_fidelity), first_element_only))


def infer_schema_from_samples(
    samples: Iterable[str | None],
    first_element_only: bool = True,
    decimal_fidelity: bool = False,
) -> DataType:
    """Merge per-record inferred schemas across a sample of JSON strings —
    the honest version of the reference's first-record schema freeze
    (SURVEY.md §1.5)."""
    merged: DataType = NullType()
    for text in samples:
        if text is None:
            continue
        try:
            node = _loads(text, decimal_fidelity)
        except (ValueError, TypeError):
            continue  # malformed sample rows don't poison inference
        merged = merge_types(merged, _infer_node(node, first_element_only))
    return finalize_type(merged)


def collect_column_samples(
    df: DataFrame,
    column: str,
    sample_limit: int = 1000,
    sample_ratio: float | None = None,
) -> list[str]:
    """Deterministic bounded sample of a column's non-null string values.

    Ordered by a stable hash of the value (ties by value) before the limit:
    a bare ``limit(n)`` is partition-order-dependent, so the inferred schema
    could flip between runs on heterogeneous data.  orderBy + limit compiles
    to TakeOrderedAndProject — a per-partition top-n heap, no full sort
    shuffle — so this stays O(data) with O(n) driver transfer.

    At 100 TB, pass ``sample_ratio`` to pre-thin with a deterministic
    CONTENT-hash threshold (not ``.sample()``, whose draw depends on the
    physical partitioning): the heap then sees only ~ratio of the rows, and
    the surviving set — hence the inferred schema — is identical under any
    repartitioning of the same data.
    """
    src = df.select(F.col(column).cast("string").alias("j")).where(F.col("j").isNotNull())
    if sample_ratio is not None:
        bound = max(1, int(sample_ratio * 2**20))
        src = src.where(F.pmod(F.xxhash64("j"), F.lit(2**20)) < bound)
    rows = src.orderBy(F.xxhash64("j"), "j").limit(sample_limit).collect()
    return [r["j"] for r in rows]


def infer_schema_for_column(
    df: DataFrame,
    column: str,
    sample_limit: int = 1000,
    sample_ratio: float | None = None,
    first_element_only: bool = True,
    decimal_fidelity: bool = False,
) -> DataType:
    """Infer the schema of a JSON-text column from a bounded sample.

    Only ``sample_limit`` non-null strings ever reach the driver; for a
    100 TB table that is a single-partition-ish scan of one pruned column
    (Catalyst pushes both the projection and the limit into the scan).
    """
    samples = collect_column_samples(df, column, sample_limit, sample_ratio)
    return infer_schema_from_samples(samples, first_element_only, decimal_fidelity)


def decimal_leaf_paths(samples: Iterable[str | None]) -> list[str]:
    """Dotted struct paths whose sampled values held JSON floats — the fields
    the reference's BigDecimal -> string rule (ExpandJson.java:212-213) turns
    into strings.  The bare-scalar root is ``""``.  Array-internal decimals
    are not tracked (no stable per-element path); those stay on the from_json
    value path."""
    paths: set[str] = set()

    def walk(node: Any, prefix: str) -> None:
        if isinstance(node, decimal.Decimal):
            paths.add(prefix)
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else str(k))

    for text in samples:
        if text is None:
            continue
        try:
            node = json.loads(text, parse_float=decimal.Decimal)
        except (ValueError, TypeError):
            continue
        walk(node, "")
    return sorted(paths)


def assign_schema_names(
    dtype: DataType,
    prefix: str,
    with_root: bool = False,
    names: dict | None = None,
):
    """Carry the reference's generated struct-schema names as field metadata.

    The reference numbers each *distinct field list* ``prefix``, ``prefix2``,
    ``prefix3``... bottom-up in inference order, deduplicated by field list
    (ExpandJson.java:69-71, 233-245).  Spark ``StructType`` is anonymous, so
    the name rides in ``StructField.metadata["connect.name"]`` — functionally
    inert, reconstructable by an Avro/Schema-Registry sink (SURVEY.md §1.3).

    ``with_root=True`` returns ``(walked, root_name)`` where ``root_name`` is
    the name the ROOT struct itself receives — numbered after all its
    children, matching the reference's bottom-up build order.  The root name
    has no StructField of its own to ride on inside the type; ``expand_json``
    attaches it as COLUMN metadata on top-level expanded columns (nested
    ``withField`` rewrites cannot carry it — documented metadata-only limit).

    ``names`` lets a caller share ONE name map (counter + dedup state)
    across several calls: the reference's ``generatedSchemaNames`` /
    ``schemaNameIndex`` are INSTANCE fields shared across all configured
    fields (ExpandJson.java:69-71, 238), so with ``fields=[a,b]`` field
    b's structs continue numbering from — and dedup against — field a's.
    ``expand_json`` passes one dict for the whole call.
    """
    if names is None:
        names = {}

    def key_of(st: StructType) -> tuple:
        return tuple((f.name, f.dataType.simpleString()) for f in st.fields)

    def name_for(st: StructType) -> str:
        k = key_of(st)
        if k not in names:
            n = len(names)
            names[k] = prefix if n == 0 else f"{prefix}{n + 1}"
        return names[k]

    def walk(dt: DataType) -> DataType:
        if isinstance(dt, ArrayType):
            return ArrayType(walk(dt.elementType), containsNull=True)
        if isinstance(dt, StructType):
            new_fields = []
            for f in dt.fields:
                child = walk(f.dataType)  # bottom-up: children named first
                meta = dict(f.metadata or {})
                if isinstance(child, StructType):
                    meta["connect.name"] = name_for(child)
                new_fields.append(StructField(f.name, child, nullable=True, metadata=meta))
            return StructType(new_fields)
        return dt

    walked = walk(dtype)
    if not with_root:
        return walked
    root = name_for(walked) if isinstance(walked, StructType) else None
    return walked, root
