"""Text analysis operators for training-data pipelines — [EXT]
(SURVEY.md §2.2: language-ID, quality scoring, token counting, document
fingerprinting). All pure Column expressions over the ``documents`` table
shape (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.functions.text import (
    alpha_ratio,
    bpe_ish_token_count,
    md5_fingerprint,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    unique_token_ratio,
)

# Tiny per-language marker-word profiles for the n-gram/stopword heuristic
# language-ID. Deliberately small + inline so the DuckDB oracle can embed the
# identical lists; swap for real profiles (fastText-style) in production.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (the MOSS scheme):
    hash every character k-gram, then keep the minimum hash of each sliding
    window of ``window`` consecutive k-grams; the distinct minima are the
    document's fingerprints — position-robust, so local edits only perturb
    nearby fingerprints (unlike a whole-document hash).

    md5 hash family (lexicographic minima) so the DuckDB oracle reproduces
    values exactly. Staged projections keep each step single-evaluation
    (see dedup.minhash_signatures). Returns (id, fingerprint) exploded rows.
    """
    # stage the normalized text FIRST: inlined, lower(trim(text)) would be
    # re-evaluated inside the transform lambda for EVERY gram (O(len^2)
    # character work per doc — measured ~2x on the whole fingerprint pass).
    # fan_out: one md5 per character k-gram is the heaviest narrow stage in
    # the text family; unsplittable scans must not run it on one core.
    from kafka_connect_expand_json_transform_spark.operators.partitioning import fan_out

    normed = fan_out(df).select(
        F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("__t")
    )
    c = F.col("__t")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: F.substring(c, i, k),
    )
    staged = normed.select(F.col(id_col), grams.alias("__grams")).select(
        F.col(id_col),
        F.transform("__grams", lambda g: F.md5(g)).alias("__hs"),
    )
    # least(element_at...) instead of array_min(slice(...)): no per-window
    # sub-array allocation (13% faster at sf0.1, identical values —
    # element_at past the end yields NULL, which least skips, matching
    # array_min over a short slice)
    hs = F.col("__hs")
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(hs) - (window - 1), F.lit(1))),
        lambda j: F.least(*[F.element_at(hs, j + i) for i in range(window)]),
    )
    return staged.select(
        F.col(id_col), F.explode(F.array_distinct(wins)).alias("fingerprint")
    )


def profile_text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics — the filter columns a curation pipeline
    thresholds on."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_tokens_bpe"),
        F.round(unique_token_ratio(text_col), 4).alias("uniq_ratio"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(alpha_ratio(text_col), 4).alias("alpha_ratio"),
        quality_score(text_col).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language-ID: count marker-word hits per language profile,
    argmax with deterministic tie-break on language code. One narrow pass."""
    toks = tokens(F.col(text_col))
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(*words))).alias("score"),
            # negative-ordering trick folded into struct comparison: compare
            # by score first; ties broken by lexicographically SMALLEST code,
            # so invert the code ordering via a sort on (-score, code)
            F.lit(code).alias("code"),
        )
        for code, words in sorted(LANG_PROFILES.items())
    ]
    # array_sort on struct sorts ascending by (score, code); the winner is the
    # max score with min code on ties -> sort by score asc then take from the
    # end among equal scores the first code: easiest deterministic pick is
    # reduce with an explicit comparator
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).alias("score"), F.lit("zz").alias("code")),
        lambda acc, s: F.when(
            (s["score"] > acc["score"])
            | ((s["score"] == acc["score"]) & (s["code"] < acc["code"])),
            s,
        ).otherwise(acc),
    )
    return df.withColumn(out_col, best["code"]).withColumn(
        out_col + "_score", best["score"]
    )


def fingerprint_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, md5 fingerprint of normalized text) — the exact-dedup key and
    lineage id for a curation pipeline."""
    return df.select(F.col(id_col), md5_fingerprint(F.col(text_col)).alias("fingerprint"))


# --- repetition metrics (Gopher-style repetitious-text signals) -------------

def ngrams_all(toks, n: int = 2):
    """ALL n-gram occurrences (not deduplicated — repetition needs
    multiplicity) from a staged token-array column."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array())


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-doc repetition signals (the Gopher repetition filters):

    * ``dup_token_frac``  — 1 - distinct/total tokens (word-level repetition)
    * ``top_ngram_frac``  — occurrences of the most frequent n-gram / total
      n-gram occurrences (boilerplate/templating signal)

    Shape: ONE shuffle total. Repartitioning by the doc id up front satisfies
    the clustering requirement of BOTH downstream aggregations (hash(doc_id)
    clusters (doc_id, ngram) too — the subset rule), so neither groupBy adds
    an exchange; the per-(doc,ngram) counting and the per-doc max/sum both
    run partition-local. Measured 1.6x faster than the naive
    two-shuffle plan at sf0.1, and at 100 TB the win is a full corpus-sized
    shuffle avoided.
    """
    staged = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("__toks"),
    ).repartition(id_col).select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("n_distinct_tokens"),
        F.explode_outer(ngrams_all("__toks", n)).alias("ngram"),
    )
    per_gram = staged.groupBy(id_col, "n_tokens", "n_distinct_tokens", "ngram").agg(
        F.count("ngram").alias("c")
    )
    return per_gram.groupBy(id_col, "n_tokens", "n_distinct_tokens").agg(
        F.coalesce(F.max("c"), F.lit(0)).alias("top_ngram_count"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_ngrams"),
    ).select(
        id_col,
        "n_tokens",
        F.round(
            1
            - F.col("n_distinct_tokens")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            4,
        ).alias("dup_token_frac"),
        F.round(
            F.col("top_ngram_count")
            / F.greatest(F.col("n_ngrams"), F.lit(1)).cast("double"),
            4,
        ).alias("top_ngram_frac"),
    )


# --- PII redaction ----------------------------------------------------------

# Patterns restricted to syntax shared by Java regex (Spark) and RE2 (DuckDB):
# no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"\+[0-9][0-9 ()-]{6,}[0-9]",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace PII-shaped spans with ``<KIND>`` placeholders and count the
    redactions per kind.  Pure ``regexp_replace``/``regexp_count`` column
    expressions — JVM regex in codegen, no UDF, trivially scan-parallel."""
    pats = patterns or PII_PATTERNS
    out = out_col or text_col
    redacted = F.col(text_col)
    counts = []
    for kind, pat in pats.items():
        counts.append(F.regexp_count(redacted, F.lit(pat)).alias(f"n_{kind}"))
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return df.select(
        *[c for c in df.columns if c != out],
        *counts,
        redacted.alias(out),
    )


# --- TF-IDF keyword extraction ----------------------------------------------

def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (``tf/len * ln((N+1)/(df+1))``), ranked on the 6-decimal-rounded score
    with term as the deterministic tie-break.

    Scale shape: doc length is staged BEFORE the explode (no per-doc
    re-aggregation); term doc-frequency is one term-keyed aggregation; the
    corpus size joins in as a broadcast scalar; top-k is a doc-partitioned
    window.
    """
    from pyspark.sql import Window

    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.size("__toks").alias("__len"), F.col("__toks"))
    terms = staged.select(
        F.col(id_col), F.col("__len"), F.explode("__toks").alias("term")
    )
    tf = terms.groupBy(id_col, "__len", "term").agg(F.count("*").alias("__c"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("__df"))
    n_docs = df.agg(F.count("*").alias("__n"))
    score = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                (F.col("__c").cast("double") / F.col("__len").cast("double"))
                * F.log(
                    (F.col("__n") + F.lit(1)).cast("double")
                    / (F.col("__df") + F.lit(1)).cast("double")
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        score.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    hash_bits: int = 256,
) -> DataFrame:
    """Deterministic salted-hash pseudonymization: replace identifier columns
    with ``sha2(salt || value, bits)`` — the reversible-nowhere companion to
    ``redact_pii`` (which masks in-text patterns; this tokenizes whole
    columns). Same value + same salt -> same token, so joins on the
    pseudonymized key still work across tables — the property that makes
    this the standard pre-release treatment for user ids.

    Narrow projection (codegen'd sha2), no shuffle; NULLs stay NULL.
    """
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), hash_bits)
        )
    return out
