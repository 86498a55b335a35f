"""Distributed BPE vocabulary training (byte-pair-encoding merge rounds).

The tokenizer-construction primitive behind every "BPE-ish" token count
(SURVEY.md §2.3): per round, count adjacent symbol pairs across the corpus's
word-frequency table (weighted by word frequency, exact int64), pick the most
frequent pair (count-desc / a / b deterministic tie-break), merge it
everywhere, repeat.

Design for cross-engine exactness and 100 TB scale:

* Pair counting runs over the AGGREGATED ``(word, freq)`` table, never the
  corpus — 100 TB of text collapses to a vocabulary-sized frame at the first
  groupBy.  The ``top_words`` cap is the standard BPE pre-tokenization step.
* Symbols ride as a '.'-delimited string (words pre-filtered to ``^[a-z]+$``
  so the delimiter cannot collide) and a merge is ONE literal string
  ``replace`` — leftmost non-overlapping semantics, identical in Spark,
  DuckDB, and Python ``str.replace`` (the property-test reference).
* Each round moves one 1-row TakeOrdered result to the driver (the
  kmeans-centroid pattern, ``llmops/similarity.py``); the merge is a narrow
  expression, so no shuffle grows with round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_train_reference", "bpe_encode", "bpe_encode_reference"]


def bpe_train(
    words: DataFrame,
    rounds: int = 3,
    word_col: str = "w",
    freq_col: str = "f",
) -> list[tuple[int, str, str, int]]:
    """Run ``rounds`` BPE merges over a ``(word, freq)`` frame; returns
    ``[(round, pair_a, pair_b, weighted_count), ...]``.  Words must match
    ``^[a-z]+$`` (caller-filtered) — '.' is the symbol delimiter."""
    seqs = words.select(
        F.col(freq_col).alias("f"),
        F.concat(F.lit("."), F.regexp_replace(word_col, "(.)", "$1.")).alias("seq"),
    ).localCheckpoint(eager=True)  # vocabulary-sized; rounds re-consume it

    out: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        syms = seqs.select(
            "f", F.filter(F.split("seq", "[.]"), lambda x: x != "").alias("s")
        ).filter(F.size("s") > 1)
        pairs = syms.select(
            "f",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s)-1),"
                    " i -> struct(s[i-1] AS a, s[i] AS b))"
                )
            ).alias("p"),
        )
        best_rows = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("f").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()  # 1 row to the driver per round, like k centroids
        )
        if not best_rows:
            break
        best = best_rows[0]
        out.append((rnd, best["a"], best["b"], best["n"]))
        seqs = seqs.select(
            "f",
            F.replace(
                "seq",
                F.lit(f".{best['a']}.{best['b']}."),
                F.lit(f".{best['a']}{best['b']}."),
            ).alias("seq"),
        ).localCheckpoint(eager=True)
    return out


def bpe_train_reference(
    word_freqs: dict[str, int], rounds: int = 3
) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference implementation with IDENTICAL semantics (the
    property-test twin of ``bpe_train``): same dotted-string representation,
    same adjacency counting (overlapping occurrences each count), same
    leftmost non-overlapping ``str.replace`` merge, same (count desc, a, b)
    tie-break."""
    seqs = {f".{'.'.join(w)}.": f for w, f in word_freqs.items()}
    out: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in seqs.items():
            s = [x for x in seq.split(".") if x != ""]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rnd, a, b, n))
        merged: dict[str, int] = {}
        for seq, f in seqs.items():
            m = seq.replace(f".{a}.{b}.", f".{a}{b}.")
            merged[m] = merged.get(m, 0) + f
        seqs = merged
    return out


def bpe_encode(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a FIXED, already-learned merge table to a word frame — the
    tokenizer-application half of BPE (``bpe_train`` is the construction
    half; in production you train once and encode 100 TB with the frozen
    table, exactly this shape).

    Adds ``seq_col``: the '.'-delimited segmentation (``.st.r.e.am.`` for
    symbols ``st|r|e|am``) and ``n_symbols``.  Merges apply in table order,
    each as ONE literal ``replace`` of ``.a.b.`` -> ``.ab.`` — the same
    leftmost non-overlapping dialect ``bpe_train`` used while learning the
    table, so encode(train corpus) reproduces the trainer's final state.
    Later merges may consume earlier merge outputs (``(m, er)`` after
    ``(e, r)``) — table order is the rank order.

    Scale (100 TB): the whole encode is a chain of ``len(merges)`` literal
    string replaces — pure whole-stage-codegen expressions, zero shuffle,
    zero Python in the hot path.  Words must match ``^[a-z]+$``
    (caller-filtered), so the '.' delimiter cannot collide.
    """
    seq = F.concat(F.lit("."), F.regexp_replace(word_col, "(.)", "$1."))
    for a, b in merges:
        seq = F.replace(seq, F.lit(f".{a}.{b}."), F.lit(f".{a}{b}."))
    return words.withColumn(seq_col, seq).withColumn(
        "n_symbols",
        F.size(F.filter(F.split(seq_col, "[.]"), lambda x: x != "")).cast("bigint"),
    )


def bpe_decode(
    encoded: DataFrame, seq_col: str = "seq", word_col: str = "decoded"
) -> DataFrame:
    """Invert ``bpe_encode``: concatenate the segmentation's symbols back
    into the word (BPE is lossless by construction — symbols partition the
    byte string, so decode is delimiter removal).  One codegen
    ``replace``; the round-trip ``decode(encode(w)) == w`` is
    property-tested for every merge table."""
    return encoded.withColumn(word_col, F.replace(F.col(seq_col), F.lit("."), F.lit("")))


def bpe_encode_reference(word: str, merges: list[tuple[str, str]]) -> str:
    """Pure-Python twin of ``bpe_encode`` (property-test reference): same
    dotted representation, same ordered leftmost non-overlapping replaces."""
    seq = f".{'.'.join(word)}."
    for a, b in merges:
        seq = seq.replace(f".{a}.{b}.", f".{a}{b}.")
    return seq
