"""UDTF surface — [EXT] (SURVEY.md §2.2 "UDF surface": python UDF, pandas
UDF, UDTF, pandas UDAF). The reference has no function surface at all; these
demonstrate each registration path the engine exposes.

UDTFs (Spark 3.5+) return multiple rows per input — the lateral-join shape.
Kept deterministic and dependency-free so the DuckDB oracle can reproduce
results with unnest().
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, sentence: string")
class SplitSentences:
    """Split text into trimmed non-empty '.'-separated sentences with their
    position. Deterministic; oracle-equivalent to
    unnest(string_split(text, '.')) with an index."""

    def eval(self, text: str):  # noqa: D102 - contract defined by Spark UDTF
        if text is None:
            return
        pos = 0
        for part in text.split("."):
            s = part.strip()
            if s:
                yield pos, s
                pos += 1




class ExtractJsonKeys:
    """POLYMORPHIC UDTF (Spark 4 ``analyze``): output schema computed at plan
    time from a literal argument — one string column per requested JSON key.

    ``SELECT * FROM extract_json_keys(props, 'k,tag')`` yields columns
    ``k, tag``.  This is the UDTF-side answer to per-record dynamic shapes:
    the caller names the keys, the schema materializes to match — the same
    plan-time-resolution philosophy as expand_json's sample strategy, but
    driven by the query text instead of the data.  Values come back as raw
    JSON-token text (unquoted strings, digit runs for numbers), matching
    what json_extract_string returns in ANSI SQL oracles.
    """

    @staticmethod
    def analyze(text, keys):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        if not keys.isConstantExpression or keys.value is None:
            raise ValueError(
                "extract_json_keys requires a literal key list, e.g. 'a,b'"
            )
        schema = StructType()
        for k in str(keys.value).split(","):
            k = k.strip()
            if k:
                schema = schema.add(k, StringType(), True)
        if not schema.fields:
            raise ValueError("extract_json_keys: no keys requested")
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, keys: str):  # noqa: D102 - Spark UDTF contract
        import json as _json

        names = [k.strip() for k in keys.split(",") if k.strip()]
        if text is None:
            yield tuple(None for _ in names)
            return
        try:
            obj = _json.loads(text)
        except ValueError:
            yield tuple(None for _ in names)
            return
        if not isinstance(obj, dict):
            yield tuple(None for _ in names)
            return

        def as_text(v):
            if v is None:
                return None
            if isinstance(v, str):
                return v
            return _json.dumps(v, separators=(",", ":"))

        yield tuple(as_text(obj.get(k)) for k in names)


@udtf(returnType="event_type: string, n: long, sum_cents: long")
class PartitionStats:
    """TABLE-argument UDTF (Spark 4): consumed as
    ``SELECT * FROM partition_stats(TABLE(t) PARTITION BY event_type)`` —
    the planner feeds each partition's rows to ONE instance (eval per row,
    terminate once), the polymorphic-input side of the UDTF surface that
    scalar-argument UDTFs can't show.  Input rows need ``event_type`` and
    integer ``cents``; the running state is two int64s per instance."""

    def __init__(self):
        self._key = None
        self._n = 0
        self._sum = 0

    def eval(self, row):
        self._key = row["event_type"]
        self._n += 1
        self._sum += row["cents"]

    def terminate(self):
        if self._n:
            yield self._key, self._n, self._sum


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT * FROM split_sentences(...)``)."""
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("extract_json_keys", _udtf(ExtractJsonKeys))
    spark.udtf.register("partition_stats", PartitionStats)
    # the Arrow-optimized tier (Spark 4 useArrow=True): identical eval logic,
    # Arrow record batches across the JVM/Python boundary instead of pickled
    # rows — the UDTF twin of arrow_udf_parity's scalar-UDF migration rung
    spark.udtf.register(
        "split_sentences_arrow",
        _udtf(SplitSentences.func, returnType="pos: int, sentence: string",
              useArrow=True),
    )
