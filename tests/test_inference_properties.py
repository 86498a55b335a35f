"""Property-based schema-inference tests (SURVEY.md §5 strategy (4)):
random JSON documents; invariants the reference rule table guarantees.

Driver-side only (no SparkSession needed): the inference module is pure
Python over parsed JSON, exactly like the reference's inferSchema
(ExpandJson.java:191-258) is pure Java over Jackson nodes.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_expand_json_transform_spark.schema_inference import (
    finalize_type,
    infer_schema_for_json,
    infer_schema_from_samples,
    merge_types,
)
from pyspark.sql.types import (
    ArrayType,
    DataType,
    IntegerType,
    LongType,
    NullType,
    StringType,
    StructType,
)

json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**70), max_value=2**70)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    max_leaves=20,
)


def no_nulltype(dt: DataType) -> bool:
    if isinstance(dt, NullType):
        return False
    if isinstance(dt, ArrayType):
        return no_nulltype(dt.elementType)
    if isinstance(dt, StructType):
        return all(no_nulltype(f.dataType) for f in dt.fields)
    return True


def all_nullable(dt: DataType) -> bool:
    if isinstance(dt, ArrayType):
        return dt.containsNull and all_nullable(dt.elementType)
    if isinstance(dt, StructType):
        return all(f.nullable and all_nullable(f.dataType) for f in dt.fields)
    return True


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_inference_never_throws_and_is_finalized(value):
    dt = infer_schema_for_json(json.dumps(value))
    # reference invariants: no unfinalized sentinel, everything optional
    assert no_nulltype(dt)
    assert all_nullable(dt)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_inference_deterministic(value):
    text = json.dumps(value)
    assert infer_schema_for_json(text) == infer_schema_for_json(text)


@given(st.lists(json_values, min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_merge_order_insensitive_on_reversal(values):
    """Merging a sample forward and backward must agree on field *types*;
    struct field order is first-seen by design (reference: JSON key order),
    so compare order-insensitively."""

    def canon(dt: DataType):
        if isinstance(dt, StructType):
            return ("struct", frozenset((f.name, canon(f.dataType)) for f in dt.fields))
        if isinstance(dt, ArrayType):
            return ("array", canon(dt.elementType))
        return dt.simpleString()

    texts = [json.dumps(v) for v in values]
    fwd = infer_schema_from_samples(texts)
    bwd = infer_schema_from_samples(list(reversed(texts)))
    assert canon(fwd) == canon(bwd)


@given(json_values, json_values)
@settings(max_examples=200, deadline=None)
def test_merge_commutative_associative_ish(a, b):
    ta = infer_schema_for_json(json.dumps(a))
    tb = infer_schema_for_json(json.dumps(b))

    def canon(dt: DataType):
        if isinstance(dt, StructType):
            return ("struct", frozenset((f.name, canon(f.dataType)) for f in dt.fields))
        if isinstance(dt, ArrayType):
            return ("array", canon(dt.elementType))
        return dt.simpleString()

    assert canon(finalize_type(merge_types(ta, tb))) == canon(
        finalize_type(merge_types(tb, ta))
    )


def test_int_boundaries_exact():
    # the reference's 32/64-bit numeric splits (ExpandJson.java:201-209)
    assert infer_schema_for_json(str(2**31 - 1)) == IntegerType()
    assert infer_schema_for_json(str(2**31)) == LongType()
    assert infer_schema_for_json(str(-(2**31))) == IntegerType()
    assert infer_schema_for_json(str(-(2**31) - 1)) == LongType()
    assert infer_schema_for_json(str(2**63 - 1)) == LongType()
    assert infer_schema_for_json(str(2**63)) == StringType()


# --- deterministic-split scheme properties (driver-side: the scheme is
# md5(f"{id}:{seed}")[:8] vs fixed-width hex thresholds; hashlib reproduces
# the Spark/DuckDB expression byte-for-byte) ---------------------------------

import hashlib

from kafka_connect_expand_json_transform_spark.llmops.splits import (
    _HASH_SPACE,
    hex_threshold,
)


def _py_hash(i, seed):
    return hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8]


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_hex_threshold_bounds(f):
    t = hex_threshold(f)
    if f >= 1.0:
        assert t == "g"  # +inf sentinel: sorts after every hex digit
    else:
        assert len(t) == 8 and int(t, 16) == int(f * _HASH_SPACE)


@given(
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_hex_threshold_monotone(a, b):
    lo, hi = sorted((a, b))
    # lexicographic order on the fixed-width thresholds == numeric order
    assert hex_threshold(lo) <= hex_threshold(hi)


@settings(max_examples=20)
@given(st.floats(min_value=0.1, max_value=0.9))
def test_split_scheme_proportions(frac):
    t = hex_threshold(frac)
    kept = sum(1 for i in range(4000) if _py_hash(i, "split") < t)
    # uniformity of md5: observed share within 4pp of the target fraction
    assert abs(kept / 4000 - frac) < 0.04


def test_split_scheme_seed_independence():
    # different seeds give (near-)independent draws: overlap of two 50%
    # samples is ~25%, not ~50%
    a = {i for i in range(4000) if _py_hash(i, "s1") < hex_threshold(0.5)}
    b = {i for i in range(4000) if _py_hash(i, "s2") < hex_threshold(0.5)}
    inter = len(a & b) / 4000
    assert 0.2 < inter < 0.3


def test_inference_is_partitioning_invariant(spark):
    """VERDICT r01 #5: same data => same inferred schema, however the data is
    partitioned or ordered.  The fixture mixes int-typed and double-typed
    records with sample_limit far below the row count, so any
    partition-order-dependent draw (the old bare limit(n)) would flip the
    widened type between layouts."""
    from kafka_connect_expand_json_transform_spark.schema_inference import (
        infer_schema_for_column,
    )

    rows = [(i, '{"v": %s}' % (i if i % 19 else f"{i}.5")) for i in range(4000)]
    base = spark.createDataFrame(rows, "id int, j string")
    layouts = [
        base.repartition(1),
        base.repartition(32),
        base.repartition(7, "id"),
        base.orderBy("id"),
        base.orderBy(base.id.desc()),
        base.repartition(16).sortWithinPartitions("j"),
    ]
    schemas = {
        str(infer_schema_for_column(df, "j", sample_limit=100)) for df in layouts
    }
    assert len(schemas) == 1, schemas
    # the hash-threshold pre-thinning path is partitioning-invariant too
    thinned = {
        str(
            infer_schema_for_column(df, "j", sample_limit=100, sample_ratio=0.25)
        )
        for df in layouts
    }
    assert len(thinned) == 1, thinned
