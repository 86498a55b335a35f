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


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT * FROM split_sentences(...)``)."""
    spark.udtf.register("split_sentences", SplitSentences)
