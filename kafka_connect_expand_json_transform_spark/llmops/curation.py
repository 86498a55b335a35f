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
    from kafka_connect_expand_json_transform_spark.operators.partitioning import fan_out

    # fan_out at the head: the quality score re-tokenizes each document four
    # times and the exact-dedup fingerprint normalizes+hashes the full text —
    # all narrow work that an unsplittable single-row-group scan would run on
    # one core (no-op at real scale, see operators/partitioning.py)
    staged = quality_filter(fan_out(df), text_col, min_quality, min_tokens)
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


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 80,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher-style quality-rule flags (Rae et al. 2021,
    "Scaling Language Models" §A1.1 heuristics, bounds re-parameterized for
    the corpus at hand): one boolean column per rule plus ``gopher_pass``.

    Every rule is an INTEGER comparison — rational thresholds are
    cross-multiplied (mean word length in [3,7] becomes ``sum_len`` vs
    ``3*n``/``7*n``; alpha fraction >= 4/5 becomes ``5*alpha < 4*n``) — so a
    SQL oracle reproduces each flag bit-for-bit with no float ratio ever
    crossing the engine boundary.

    Rules: word count outside [min_words, max_words]; mean word length
    outside [3, 7]; symbol-to-word ratio ('#' + '...') > 1/10; fraction of
    words containing an alphabetic char < 4/5; fewer than
    ``min_stopword_hits`` distinct stopwords (DEFAULT_STOPWORDS, the
    list quality_score uses); unique-token fraction < 1/2 (the repetition
    rule).

    Plan shape: one narrow projection — the token array is staged once and
    every rule reads the staged attribute (no re-tokenization per rule); no
    shuffle, no UDF, pushes into the scan at any scale.
    """
    from kafka_connect_expand_json_transform_spark.functions.text import (
        DEFAULT_STOPWORDS,
        tokens,
    )

    staged = df.withColumn("__toks", tokens(text_col))
    t = F.col("__toks")
    c = F.col(text_col)
    n = F.size(t)
    sum_len = F.length(F.array_join(t, ""))
    alpha_words = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
    distinct_n = F.size(F.array_distinct(t))
    sym = (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))) + (
        (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("long")
    stop_hits = None
    for w in DEFAULT_STOPWORDS:
        hit = F.array_contains(t, w).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    flags = {
        "flag_word_count": (n < min_words) | (n > max_words),
        "flag_mean_word_len": (sum_len < 3 * n) | (sum_len > 7 * n),
        "flag_symbol_ratio": (10 * sym) > n,
        "flag_alpha_ratio": (5 * alpha_words) < (4 * n),
        "flag_stopwords": stop_hits < min_stopword_hits,
        "flag_repetition": (2 * distinct_n) < n,
    }
    out = staged
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    no_flag = None
    for name in flags:
        cnd = ~F.col(name)
        no_flag = cnd if no_flag is None else no_flag & cnd
    return out.withColumn("gopher_pass", no_flag).drop("__toks")


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    line_words: int = 16,
    min_line_words: int = 5,
    line_blockword: str = "slow",
    page_blockword: str = "dup",
    min_kept_lines: int = 3,
) -> DataFrame:
    """Per-document C4-style LINE-level cleanup census (Raffel et al. 2020
    §2.2), re-parameterized for this corpus the same way
    ``dedup.paragraph_dedup`` is: the corpus carries no newlines or
    punctuation (FIXTURES.md), so fixed ``line_words``-token windows stand
    in for lines, ``line_blockword`` for C4's drop-lines-with-"javascript"
    rule, and ``page_blockword`` for its drop-pages-with-"lorem ipsum"
    rule.  C4's rule set, one column each:

    * a line survives iff it has >= ``min_line_words`` words (C4's
      terminal-punctuation/short-line rule) AND does not contain
      ``line_blockword``;
    * a page survives iff it does not contain ``page_blockword`` AND keeps
      >= ``min_kept_lines`` lines (C4's "at least 3 sentences" rule).

    Adds: ``n_lines``, ``n_short_lines``, ``n_blockword_lines``,
    ``n_kept_lines``, ``kept_words``, ``flag_page_blocklist``,
    ``flag_few_lines``, ``c4_keep``.  All counters are integers, so a SQL
    oracle reproduces them exactly.

    Plan shape: tokenize once, window/filter/count entirely inside array
    HOFs over the staged token column — zero explode, zero shuffle, zero
    Python; the per-document line array is bounded by doc length /
    ``line_words`` so lambda-interpretation cost stays negligible next to
    the scan (the interpreted-HOF caveat only bites on per-bit vote
    shapes)."""
    from kafka_connect_expand_json_transform_spark.functions.text import tokens

    staged = df.withColumn("__toks", tokens(text_col))
    t = F.col("__toks")
    n = F.size(t)
    n_lines = F.ceil(n / F.lit(line_words)).cast("int")
    lines = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.slice(t, i * line_words + 1, line_words),
        ),
    ).otherwise(F.expr("array()").cast("array<array<string>>"))
    staged = staged.withColumn("__lines", lines)
    L = F.col("__lines")
    long_enough = lambda x: F.size(x) >= min_line_words  # noqa: E731
    kept = F.filter(
        L, lambda x: long_enough(x) & ~F.array_contains(x, line_blockword)
    )
    out = (
        staged.withColumn("n_lines", F.size(L).cast("bigint"))
        .withColumn(
            "n_short_lines",
            F.size(F.filter(L, lambda x: ~long_enough(x))).cast("bigint"),
        )
        .withColumn(
            "n_blockword_lines",
            F.size(
                F.filter(
                    L,
                    lambda x: long_enough(x) & F.array_contains(x, line_blockword),
                )
            ).cast("bigint"),
        )
        .withColumn("__kept", kept)
        .withColumn("n_kept_lines", F.size(F.col("__kept")).cast("bigint"))
        .withColumn(
            "kept_words",
            F.aggregate(
                F.col("__kept"), F.lit(0), lambda acc, x: acc + F.size(x)
            ).cast("bigint"),
        )
        .withColumn("flag_page_blocklist", F.array_contains(t, page_blockword))
        .withColumn(
            "flag_few_lines",
            ~F.array_contains(t, page_blockword)
            & (F.size(F.col("__kept")) < min_kept_lines),
        )
    )
    return out.withColumn(
        "c4_keep",
        ~F.col("flag_page_blocklist") & ~F.col("flag_few_lines"),
    ).drop("__toks", "__lines", "__kept")
