"""Sequence packing — [EXT] LLM-data-pipeline operator: group documents into
token-budget packs (the pre-tokenization step that turns a curated corpus
into fixed-budget training sequences).

Packing used here is deterministic cumulative-sum chunking: within a bucket,
docs are ordered by id and a pack boundary falls wherever the running token
count crosses a budget multiple. A pack may overshoot the budget by at most
one document (the standard greedy-chunk trade-off; true bin packing is
NP-hard and order-dependent — not worth a shuffle-heavy approximation).

Scale shape: one narrow pass for token counts, one shuffle on the bucket key,
one window cumsum per bucket. Buckets bound the window partition size, so no
single task ever sorts the whole corpus; packs are only ever built within a
bucket, which is exactly what a sharded training-data writer wants
(bucket -> output shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.functions.text import token_count


def sequence_pack(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 2048,
    num_buckets: int = 64,
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document a ``(bucket, pack_id)``; return per-doc rows with
    pack assignment and token counts. Deterministic: bucket = id % buckets,
    order inside a bucket = id.

    Pass ``tokens_col`` to pack on precomputed counts (e.g. real tokenizer
    output) instead of the whitespace token count.

    Bucketing: ``pmod(id, buckets)`` for numeric ids (negative-safe,
    SQL-reproducible); ``pmod(xxhash64(id), buckets)`` otherwise (string/UUID
    ids) — either way deterministic and never a single NULL mega-bucket.
    NULL texts count as 0 tokens (they'd otherwise poison the running sum).
    """
    from pyspark.sql.types import NumericType

    toks = F.col(tokens_col) if tokens_col else token_count(text_col)
    if isinstance(df.schema[id_col].dataType, NumericType):
        bucket = F.pmod(F.col(id_col), F.lit(num_buckets))
    else:
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets))
    w = Window.partitionBy("bucket").orderBy(id_col)
    staged = df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.coalesce(toks.cast("long"), F.lit(0)).alias("n_tokens"),
    )
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return staged.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(cum_before / token_budget).cast("int").alias("pack_id"),
    )


def pack_summary(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-pack accounting: docs per pack and total tokens (the fill-rate
    signal — mean total_tokens / budget is the packing efficiency)."""
    return packed.groupBy("bucket", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 64,
    lowercase: bool = True,
) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping windows
    of ``chunk_tokens`` whitespace tokens advancing by ``stride`` (the
    long-context training-prep step; ``stride < chunk_tokens`` gives
    overlap). Empty/null docs yield one empty chunk, never zero rows, so
    downstream joins keep every id.

    Everything is codegen'd array arithmetic — tokens are staged ONCE as a
    real column (a re-inlined expression tree would re-tokenize per chunk
    reference), then ``explode(sequence(...))`` fans out chunk indexes and
    ``slice`` cuts windows. One narrow pass, no shuffle, output ~
    ``n_tokens / stride`` rows per doc.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(f"chunk_tokens and stride must be >= 1, got {chunk_tokens}, {stride}")
    from kafka_connect_expand_json_transform_spark.functions.text import tokens

    toks = tokens(F.coalesce(F.col(text_col), F.lit("")), lowercase=lowercase)
    staged = df.select(F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n"))
    n, w, s = F.col("__n"), F.lit(chunk_tokens), F.lit(stride)
    n_extra = F.when(n > w, ((n - w + s - F.lit(1)) / s).cast("long")).otherwise(F.lit(0))
    fan = staged.select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_extra)).alias("chunk_id"),
    )
    win = F.slice(F.col("__toks"), (F.col("chunk_id") * s + 1).cast("int"), chunk_tokens)
    return fan.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(win).alias("n_chunk_tokens"),
        F.array_join(win, " ").alias("chunk_text"),
    )
