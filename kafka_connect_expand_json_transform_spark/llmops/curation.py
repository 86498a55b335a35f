"""Composite curation pipeline — the end-to-end training-data shape that the
individual llmops operators exist for (SURVEY.md §2.2): quality-filter ->
exact dedup -> near-dup dedup -> per-stage accounting.

Plan shape at 100 TB: the quality filter is a narrow projection (runs first,
prunes before any shuffle); exact dedup shuffles 16-byte fingerprints; the
MinHash stage shuffles band keys of survivors only. Stage order is therefore
also the cost order — cheapest, most selective first.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.functions.text import (
    quality_score,
    token_count,
)
from kafka_connect_expand_json_transform_spark.llmops.dedup import (
    exact_dedup,
    minhash_dedup,
)


@dataclass
class CurationReport:
    n_input: int
    n_after_quality: int
    n_after_exact_dedup: int
    n_after_near_dedup: int


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int | None = None,
) -> DataFrame:
    """Keep documents above the quality bar: composite score + token bounds.
    Pure narrow projection+filter — zero shuffle, pushes into the scan."""
    cond = (quality_score(text_col) >= min_quality) & (
        token_count(text_col) >= min_tokens
    )
    if max_tokens is not None:
        cond = cond & (token_count(text_col) <= max_tokens)
    return df.where(cond)


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    near_dup_threshold: float = 0.8,
    with_report: bool = False,
    hash_family: str = "xxhash",
):
    """Full curation pass. Returns the curated DataFrame, or
    ``(DataFrame, CurationReport)`` with per-stage counts when
    ``with_report=True`` (the report triggers one count per stage —
    accounting is optional because it is not free).  ``hash_family``
    follows ``minhash_dedup``: xxhash (production, engine-specific) or md5
    (bit-identical cross-engine, oracle-parity mode).
    """
    staged = quality_filter(df, text_col, min_quality, min_tokens)
    # lazy local checkpoint: the exact-dedup output feeds the MinHash stage
    # THREE times (signatures, Jaccard verify, final anti-join) — without it
    # the filter+groupBy+semi-join lineage re-executes per use
    exact = exact_dedup(staged, text_col, id_col).localCheckpoint(eager=False)
    near = minhash_dedup(
        exact, text_col, id_col, threshold=near_dup_threshold,
        hash_family=hash_family,
    )
    if not with_report:
        return near
    report = CurationReport(
        n_input=df.count(),
        n_after_quality=staged.count(),
        n_after_exact_dedup=exact.count(),
        n_after_near_dedup=near.count(),
    )
    return near, report
