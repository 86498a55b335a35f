"""Benchmark decontamination — [EXT] training-data pipeline operator
(SURVEY.md §2.2 north-star mandate; no reference analogue).

Standard eval-set hygiene for pretraining corpora: a training document is
*contaminated* if it shares any word n-gram with a benchmark/eval document
(the GPT-3 appendix-C scheme, typically n=8..13 on real text).  At 100 TB
the asymmetry is the whole design: the benchmark side is tiny (a few MB of
eval sets), so its distinct n-gram set is collected once and **broadcast** —
the corpus-side pass is then a narrow scan + broadcast-semi-join per doc
n-gram, with one final per-doc aggregation.  No corpus-vs-corpus shuffle
ever happens.

N-grams are built with ``transform(sequence(...))`` over a *staged* token
array (codegen, no explode until needed, and no Catalyst lambda
re-evaluation blow-up — see functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.functions.text import (
    shingles_from_tokens,
    tokens,
)


def ngram_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """One row per (id, distinct n-gram).  Shingle construction stays in
    whole-stage codegen; the explode is the only row-expanding step."""
    return df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.explode(shingles_from_tokens("__toks", n)).alias("ngram"))


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """Distinct n-gram set of the benchmark side (the broadcast side)."""
    return ngram_rows(benchmark, text_col, id_col, n).select("ngram").distinct()


def contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per contaminated training doc: how many of its distinct n-grams hit
    the benchmark set.  Docs with zero hits are absent."""
    hits = ngram_rows(train, text_col, id_col, n).join(
        F.broadcast(benchmark_ngrams(benchmark, text_col, id_col, n)),
        "ngram",
        "left_semi",
    )
    return hits.groupBy(id_col).agg(F.count("*").alias("n_hit_ngrams"))


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Drop every training doc sharing at least one n-gram with the
    benchmark.  Train side is scanned once; benchmark n-grams broadcast."""
    contaminated = contamination_report(train, benchmark, text_col, id_col, n).select(
        id_col
    )
    return train.join(contaminated, id_col, "left_anti")
