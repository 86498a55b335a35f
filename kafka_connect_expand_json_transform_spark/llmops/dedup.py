"""Deduplication operators for training-data pipelines — [EXT]
(SURVEY.md §2.2: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Scale design (the 100 TB story):

* **exact**       — one hash-partitioned groupBy on a 128-bit fingerprint;
                    no full-text shuffle (group on the hash, carry min id).
* **MinHash+LSH** — signatures are a narrow projection; candidate generation
                    is a groupBy on band keys (only docs sharing a band key
                    co-locate); verification joins only candidate pairs.
                    Nothing ever does an all-pairs comparison.
* **connected components** — iterative min-label propagation over candidate
                    edges, log(diameter) rounds of two joins each; bounded
                    iterations; dup clusters are tiny in practice so the
                    edge table is ≪ the corpus.
* **SimHash**     — one 64-bit signature per doc; near-dup = same signature
                    band (or small hamming distance on candidate pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import warnings

from kafka_connect_expand_json_transform_spark.functions.text import (
    md5_fingerprint,
    minhash_md5,
    minhash_xxhash,
    shingles_from_tokens,
    tokens,
)
from kafka_connect_expand_json_transform_spark.operators.partitioning import fan_out


def exact_dedup(df: DataFrame, text_col: str, id_col: str, keep: str = "min") -> DataFrame:
    """Keep one row per distinct normalized text: group on the md5
    fingerprint (never on the raw text — the shuffle carries 16 bytes + id,
    not documents), keep min/max id, then semi-join back for payload."""
    agg = F.min if keep == "min" else F.max
    keepers = (
        df.select(F.col(id_col), md5_fingerprint(F.col(text_col)).alias("__fp"))
        .groupBy("__fp")
        .agg(agg(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_size: int = 3,
    hash_family: str = "xxhash",
    parallelize: bool = True,
) -> DataFrame:
    """(id, signature) per doc. ``hash_family='md5'`` is the oracle-parity
    variant (DuckDB-reproducible); ``'xxhash'`` the production fast path.

    Staged as three projections (tokens -> shingles -> signature) so each
    intermediate is a materialized attribute: Catalyst re-evaluates nested
    expression trees at every lambda reference, so inlining would recompute
    the tokenizer ~3×positions times per doc and the whole shingle array once
    per hash — staged, each stage runs once per row (and CollapseProject
    keeps it that way: it never merges projections that would duplicate
    expensive multi-referenced expressions).

    The input is ``fan_out`` — the 16 hashes per shingle are the most
    expensive narrow stage in the dedup family, and an unsplittable
    single-row-group scan would otherwise run all of it on one core
    (measured 2.8 s -> 0.7 s at sf0.1 for the md5 family; no-op at scale).
    ``parallelize=False`` skips that fan_out: per-micro-batch callers
    (streaming ingest) pass tiny frames where the probe + extra exchange
    per batch is a measured net loss (round-10 A/B: +0.6-0.9 s per
    2-batch loop) and the narrow stage is small by construction."""
    staged = (fan_out(df) if parallelize else df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col), shingles_from_tokens("__toks", shingle_size).alias("__sh")
    )
    sig = (
        minhash_md5(F.col("__sh"), num_hashes)
        if hash_family == "md5"
        else minhash_xxhash(F.col("__sh"), num_hashes)
    )
    return staged.select(F.col(id_col), sig.alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_bands: int = 4,
    rows_per_band: int | None = None,
    num_hashes: int | None = None,
    max_bucket: int = 200,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL hashes of any band become a
    candidate pair. Emits (id_a, id_b), id_a < id_b, distinct.

    Plan shape: explode to (band_key, id) — narrow; groupBy band_key
    collecting ids — ONE shuffle on band keys; pairs generated inside each
    (tiny) bucket. An all-pairs join never exists in the plan. Buckets larger
    than ``max_bucket`` (mass-duplicated text, boilerplate bands) emit linear
    STAR edges instead of quadratic all-pairs — see ``_pairs_from_keyed``."""
    return _lsh_pairs_impl(
        signatures, id_col, num_bands, rows_per_band, num_hashes, max_bucket
    )


def _lsh_pairs_impl(
    signatures: DataFrame,
    id_col: str,
    num_bands: int,
    rows_per_band: int | None,
    num_hashes: int | None = None,
    max_bucket: int = 200,
) -> DataFrame:
    # pass num_hashes when known: probing it costs a job over the signature plan
    n = num_hashes or signatures.select(F.size("signature")).first()[0]
    rpb = rows_per_band or max(1, n // num_bands)
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.element_at(F.col("signature").cast("array<string>"), b * rpb + r + 1) for r in range(rpb)],
            )
            for b in range(num_bands)
        ]
    )
    keyed = signatures.select(F.col(id_col), F.explode(bands).alias("band_key"))
    return _pairs_from_keyed(keyed, id_col, max_bucket)


def _pairs_from_keyed(keyed: DataFrame, id_col: str, max_bucket: int) -> DataFrame:
    """(band_key, id) -> distinct candidate pairs with ``id_a < id_b``.

    Buckets up to ``max_bucket`` emit all pairs via a WITHIN-BUCKET
    self-join (quadratic in bucket size but bounded, and fully
    whole-stage-codegen'd).  Larger buckets — exactly the mass-duplicated
    clusters dedup exists for — emit STAR edges to the bucket's min id:
    linear in bucket size and connectivity-preserving, so connected-
    components dedup still collapses the whole cluster.  The trade-off is
    that pairwise verification (Jaccard) then only checks members against
    the hub doc, relying on near-transitivity inside a giant bucket.

    History of this shape: a collect_list + nested-transform expression
    generated the pairs before round 8, but (a) interpreted higher-order
    functions run ~10x slower than the codegen'd join and pay a flaky
    multi-second JIT warm-up (measured 20-30 s vs 1.5-4 s at sf0.1 on the
    round-8 corpus), and (b) collect_list materializes an entire bucket
    as ONE array row — a mass-duplicated band at 100 TB becomes a single
    giant row long before the star cap applies.  The join never
    materializes a bucket; the (band_key, __n, __mn) routing table is the
    bucket aggregate, lazily localCheckpointed so the signature lineage
    above it executes once, not once per branch."""
    # Bucket size + min-id ride a WINDOW over band_key instead of a groupBy
    # re-joined to keyed: one exchange of (band_key, id) instead of two
    # (the groupBy shuffled keyed once and the join shuffled it again).
    # The per-bucket partition a window task holds is exactly one LSH
    # bucket's ids — bounded by construction (star routing caps the work a
    # bucket can cause downstream; the window state itself is the bucket's
    # rows, the same rows the old join materialized per task).
    from pyspark.sql import Window as _W

    w = _W.partitionBy("band_key")
    sized = (
        keyed.select(
            "band_key",
            F.col(id_col),
            F.count("*").over(w).alias("__n"),
            F.min(id_col).over(w).alias("__mn"),
        )
        .where(F.col("__n") > 1)
        .localCheckpoint(eager=False)
    )
    small = sized.where(F.col("__n") <= max_bucket)
    small_pairs = (
        small.select("band_key", F.col(id_col).alias("id_a"))
        .join(small.select("band_key", F.col(id_col).alias("id_b")),
              "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    star_pairs = sized.where(
        (F.col("__n") > max_bucket) & (F.col(id_col) != F.col("__mn"))
    ).select(F.col("__mn").alias("id_a"), F.col(id_col).alias("id_b"))
    return small_pairs.unionByName(star_pairs).distinct()


def _pairs_expr(ids: Column, assume_sorted: bool = False) -> Column:
    """All unordered pairs from an id array, as array<struct<a,b>> with
    a<b — pure expressions (flatten of per-element transforms).  The
    inner slice re-evaluates the sort per outer element (interpreted HOFs
    have no subexpression reuse: O(n^2 log n) per array), so keep this to
    SMALL-k arrays — per-entity sets like parts-per-order — never LSH
    buckets; ``_pairs_from_keyed`` generates bucket pairs with a
    codegen'd within-bucket join instead.

    ``assume_sorted=True`` skips the internal sort: pass it when ``ids``
    is ALREADY ascending (e.g. staged as ``array_sort(collect_set(...))``
    in the producing aggregate) — the sort then runs once per row instead
    of once per element reference, and the emitted pairs are identical."""
    sorted_ids = ids if assume_sorted else F.array_sort(ids)
    return F.flatten(
        F.transform(
            sorted_ids,
            lambda x, i: F.transform(
                F.slice(sorted_ids, i + 2, F.size(sorted_ids)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def jaccard_on_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only (the verify step
    after LSH). Joins the shingle arrays in, intersects in-expression —
    two broadcast-or-shuffle hash joins on ids, no explode.

    Shingles are computed ONLY for docs that appear in a pair (semi-join
    first): candidates are a vanishing fraction of the corpus, so the verify
    stage must never re-shingle all of it — and since the shingle frame is
    referenced by both join sides, the pair-filtered result is checkpointed
    once instead of being re-derived per side.  Callers should pass a
    materialized ``pairs`` frame (it is referenced three times here).
    """
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        df.join(ids, id_col, "left_semi")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), shingles_from_tokens("__toks", shingle_size).alias("sh"))
        .localCheckpoint()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
        )
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_size: int = 3,
    max_iterations: int = 10,
    hash_family: str = "xxhash",
) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> exact-Jaccard
    verify -> connected components -> keep the min-id doc per cluster.
    Returns the deduplicated DataFrame. ``hash_family='md5'`` makes every
    stage reproducible in ANSI SQL (the oracle-parity mode)."""
    # Materialization points (the standard persist discipline for multi-pass
    # pipelines): the signature table is the expensive scan-derived artifact
    # and feeds banding; the candidate pairs are tiny and referenced three
    # times by the verify stage.  Without these, every downstream action
    # re-ran the full MinHash computation.
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, hash_family
    ).localCheckpoint()
    cand = lsh_candidate_pairs(
        sigs, id_col, num_bands, num_hashes=num_hashes
    ).localCheckpoint()
    edges = (
        jaccard_on_pairs(df, cand, text_col, id_col, shingle_size)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(edges, "id_a", "id_b", max_iterations)
    # drop every doc whose component representative is a different (smaller) id
    losers = comp.where(F.col("id") != F.col("component")).select(F.col("id").alias(id_col))
    return df.join(losers, on=id_col, how="left_anti")


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """Min-label propagation + pointer jumping, no GraphFrames (SURVEY.md §7
    'hard #3'): each round every node adopts the min label among itself and
    its neighbors, then labels are path-compressed (component <- component's
    component), giving O(log diameter) rounds; each round is three shuffled
    joins on the label table — edge tables for near-dup graphs are orders of
    magnitude smaller than the corpus.

    Returns (id, component) where component = min id in the cluster. Warns if
    the iteration cap was hit before convergence (labels then still valid but
    possibly not fully merged — raise ``max_iterations``).

    Note the sum-based convergence check needs one round to OBSERVE
    stability, so a run that converges exactly at round ``max_iterations``
    exits with the warning even though its labels are correct — size
    ``max_iterations`` with +1 headroom over the expected round count.
    (The check compares exact decimal(38,0) sums; int64 could in principle
    wrap two different label sets to equality, and a decimal overflow
    would return NULL under non-ANSI mode and read as converged — both
    unreachable for any realistic id domain, decimal(38,0) holds ~1e38.)
    """
    # checkpoint FIRST: every derived frame (labels, each round) must build on
    # the materialized edges, or the full upstream pipeline (MinHash + LSH +
    # verify) re-executes once per action
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    # Convergence check: labels are monotone non-increasing (every update is
    # least(old, candidate)), so SUM(component) strictly decreases iff any
    # label changed this round.  One scan+aggregate job per round replaces
    # the old-vs-new equi-join (shuffle + filter + count) — fewer stages per
    # round at any scale.  decimal(38,0) keeps the sum exact for any id
    # domain (an int64 sum could in principle wrap back to equality).
    prev_sum = _UNSET = object()  # sentinel: SUM() is None on an empty label set
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["d"] == labels["id"])
            .groupBy(sym["s"].alias("id2"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == F.col("id2"), "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jumping: adopt the component's own component, halving the
        # remaining path length each round (this is what makes it log-round)
        parent = new_labels.select(
            F.col("id").alias("pid"), F.col("component").alias("pcomp")
        )
        new_labels = (
            new_labels.join(parent, new_labels["component"] == parent["pid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("pcomp"), F.col("component"))
                ).alias("component"),
            )
        )
        # checkpoint truncates the lineage so the plan doesn't double per
        # round; LAZY so the convergence aggregate below is the action that
        # materializes it — one Spark job per round instead of two
        new_labels = new_labels.localCheckpoint(eager=False)
        label_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if prev_sum is not _UNSET and label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        warnings.warn(
            f"connected_components hit the {max_iterations}-round cap before "
            "converging; components may be under-merged — raise max_iterations",
            stacklevel=2,
        )
    return labels


def embedding_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    max_iterations: int = 10,
    block_size: int = 2048,
) -> DataFrame:
    """Embedding-cosine near-dup removal: tiled-GEMM all-pairs above
    ``threshold`` (see ``similarity.cosine_pairs_above``) -> connected
    components -> keep the min-id row per cluster.

    At 100 TB replace the exact all-pairs stage with LSH/IVF candidates and
    keep the same edge->components->keep-min tail.
    """
    from kafka_connect_expand_json_transform_spark.llmops.similarity import (
        cosine_pairs_above,
    )

    edges = cosine_pairs_above(
        df, threshold, id_col=id_col, vec_col=vec_col, block_size=block_size
    ).select("id_a", "id_b")
    comp = connected_components(edges, "id_a", "id_b", max_iterations)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) per doc: token hashing stays in codegen (xxhash64
    expression), the 64-bit sign-vote runs as one vectorized numpy pass in a
    pandas UDF — bit-unpack the flattened hash array, segment-sum with
    ``np.add.reduceat``. The expression-only formulation (64 interpreted
    ``aggregate`` lambdas per doc) measured ~4× slower at sf0.1."""
    from pyspark.sql.functions import pandas_udf

    # cap the transient (tokens, 64) int8 bit matrix at ~128 MB per slice so
    # long-document batches can't blow executor memory in one allocation
    max_tokens_per_slice = 2_000_000

    @pandas_udf("long")
    def simhash_votes(hashes: pd.Series) -> pd.Series:
        lengths = hashes.map(len).to_numpy()
        out = np.zeros(len(hashes), dtype=np.int64)
        ne_idx = np.flatnonzero(lengths > 0)
        shifts = np.arange(64, dtype=np.uint64)
        start = 0
        while start < len(ne_idx):
            # grow the slice until the token budget is hit (≥1 doc per slice)
            end, tok = start, 0
            while end < len(ne_idx) and (
                end == start or tok + lengths[ne_idx[end]] <= max_tokens_per_slice
            ):
                tok += lengths[ne_idx[end]]
                end += 1
            sl = ne_idx[start:end]
            # int64 -> uint64 must go through astype (bit-preserving wrap);
            # direct construction from negative ints raises
            flat = np.concatenate(
                [np.asarray(hashes.iloc[i], dtype=np.int64) for i in sl]
            ).astype(np.uint64)
            # np.unpackbits over the little-endian byte view IS the bit
            # matrix: the broadcast-shift formulation
            # ((flat[:,None] >> shifts) & 1) hits a non-vectorized numpy
            # uint64 path — measured 13-25 s vs ~2 s for unpackbits at
            # 270k tokens (round-8 corpus); bit k of the uint64 is column
            # k of the little-endian unpack, verified bit-identical
            bits = np.unpackbits(
                flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            offsets = np.concatenate(([0], np.cumsum(lengths[sl])[:-1]))
            ones = np.add.reduceat(bits, offsets, axis=0, dtype=np.int64)
            # majority vote: (+1 votes) - (-1 votes) > 0  <=>  2*ones > n
            sig = ((2 * ones) > lengths[sl][:, None]).astype(np.uint64) << shifts
            out[sl] = sig.sum(axis=1).astype(np.int64)
            start = end
        return pd.Series(out)

    # fan_out: tokenization + the vote kernel are heavy narrow work; an
    # unsplittable single-row-group scan would run them on one core
    return fan_out(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        simhash_votes(F.transform("__toks", lambda t: F.xxhash64(t))).alias("simhash"),
    )


def simhash_dedup_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    band_bits: int = 16,
    max_bucket: int = 200,
) -> DataFrame:
    """SimHash near-dup candidates: docs sharing any of the four 16-bit bands
    of their 64-bit SimHash (standard Hamming-distance-≤3 trick: if two
    64-bit hashes differ in ≤3 bits, at least one of 4 bands is identical).
    Returns (id_a, id_b) candidates; callers verify with Jaccard or Hamming."""
    sig = simhash_signatures(df, text_col, id_col).withColumnRenamed("simhash", "sh")
    bands = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                F.shiftrightunsigned(F.col("sh"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .cast("string"),
            )
            for b in range(64 // band_bits)
        ]
    )
    keyed = sig.select(F.col(id_col), F.explode(bands).alias("band_key"))
    return _pairs_from_keyed(keyed, id_col, max_bucket)


def corpus_artifacts(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_size: int = 3,
    hash_family: str = "xxhash",
    near: bool = True,
    parallelize: bool = True,
) -> dict[str, DataFrame]:
    """The compact artifact tables :func:`dedup_against_corpus` needs from
    history — computed ONCE per accepted batch and appended to artifact
    storage, so later batches dedup against 100 TB of history without ever
    rescanning its text:

    - ``fingerprints``: distinct 16-byte exact-dup fingerprints
    - ``signatures`` (near only): (id, MinHash signature array)
    - ``shingles`` (near only): (id, shingle-hash array) for the verify
      stage — read back |candidates|-bounded via a semi-join, never fully

    Built with the same expressions as the text path, so artifact-fed
    dedup is byte-identical to text-fed dedup (tested)."""
    out = {
        "fingerprints": corpus.select(
            md5_fingerprint(F.col(text_col)).alias("__fp")
        ).distinct()
    }
    if near:
        out["signatures"] = minhash_signatures(
            corpus, text_col, id_col, num_hashes, shingle_size, hash_family,
            parallelize=parallelize,
        )
        out["shingles"] = corpus.select(
            F.col(id_col), tokens(F.col(text_col)).alias("__toks")
        ).select(
            F.col(id_col),
            shingles_from_tokens("__toks", shingle_size).alias("shingles"),
        )
    return out


def dedup_against_corpus(
    incoming: DataFrame,
    corpus: DataFrame | None,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_size: int = 3,
    hash_family: str = "xxhash",
    near: bool = True,
    artifacts: dict[str, DataFrame] | None = None,
    parallelize: bool = True,
) -> DataFrame:
    """INCREMENTAL dedup: drop incoming docs that duplicate the EXISTING
    corpus — exact (normalized-text fingerprint) and, with ``near=True``,
    MinHash-LSH near-duplicates — plus exact dups inside the batch itself.

    This is the production shape at 100 TB: history is never rescanned as
    text.  Pass ``artifacts=`` (from :func:`corpus_artifacts`, maintained
    incrementally by appending each accepted batch's artifacts) and
    ``corpus=None`` — the corpus side then contributes ONLY fingerprint /
    signature / shingle tables.  Candidate generation is band-bucketed
    exactly like :func:`minhash_dedup`, so the incoming-vs-corpus
    comparison is |bucket|-bounded, never |corpus|; the verify stage reads
    corpus shingles |candidates|-bounded through a semi-join.  Passing a
    text ``corpus`` computes the same artifacts inline (identical results).
    ``parallelize=False`` gates the signature-stage fan_out off — pass it
    from per-micro-batch callers whose frames are small by construction
    (see :func:`minhash_signatures`); values are unaffected either way.
    """
    if artifacts is None:
        if corpus is None:
            raise ValueError("pass either a text corpus or artifacts=")
        artifacts = corpus_artifacts(
            corpus, text_col, id_col, num_hashes, shingle_size, hash_family,
            near, parallelize=parallelize,
        )
    inc_fp = incoming.select(
        F.col(id_col), md5_fingerprint(F.col(text_col)).alias("__fp")
    )
    corp_fp = artifacts["fingerprints"]
    # exact-vs-corpus, then exact-within-batch (keep min id per fingerprint)
    fresh = inc_fp.join(corp_fp, "__fp", "left_anti")
    keep_ids = (
        fresh.groupBy("__fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    )
    survivors = incoming.join(keep_ids, id_col, "left_semi")
    if not near:
        return survivors

    # survivors is referenced three times (signatures, the verify-side
    # shingles, the final anti-join): one LAZY checkpoint — materialized by
    # cand's checkpoint below — replaces two recomputes of the scan +
    # fingerprint groupBy + semi-join chain
    survivors = survivors.localCheckpoint(eager=False)
    # sig_inc and the corpus signatures each feed ONLY the candidate join:
    # checkpointing them bought nothing and cost one materialization job
    # each — and eagerly checkpointing the corpus artifact table pulled the
    # ENTIRE history's signatures into block storage per call (per
    # micro-batch on the streaming path), an O(corpus) scale bug
    sig_inc = minhash_signatures(
        survivors, text_col, id_col, num_hashes, shingle_size, hash_family,
        parallelize=parallelize,
    )
    sig_corp = artifacts["signatures"]

    def _bands(sig_df, out_id):
        rpb = max(1, num_hashes // num_bands)
        bands = F.array(
            *[
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[
                        F.element_at(F.col("signature").cast("array<string>"), b * rpb + r + 1)
                        for r in range(rpb)
                    ],
                )
                for b in range(num_bands)
            ]
        )
        return sig_df.select(
            F.col(id_col).alias(out_id), F.explode(bands).alias("band_key")
        )

    cand = (
        _bands(sig_inc, "__inc_id")
        .join(_bands(sig_corp, "__corp_id"), "band_key")
        .select("__inc_id", "__corp_id")
        .distinct()
        .localCheckpoint()
    )

    # each shingle side feeds the verify join exactly once — no checkpoint
    # (the |candidates|-bounded semi-join is the cheap part; an eager
    # checkpoint per side was one extra materialization job each)
    def _sh(df, out_id):
        return (
            df.join(
                cand.select(F.col(out_id).alias(id_col)).distinct(), id_col, "left_semi"
            )
            .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
            .select(
                F.col(id_col).alias(out_id),
                shingles_from_tokens("__toks", shingle_size).alias(f"{out_id}_sh"),
            )
        )

    # corpus-side shingles come from the artifact table, |candidates|-bounded
    corp_sh = (
        artifacts["shingles"]
        .join(
            cand.select(F.col("__corp_id").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("__corp_id"),
            F.col("shingles").alias("__corp_id_sh"),
        )
    )

    inter = F.size(F.array_intersect("__inc_id_sh", "__corp_id_sh"))
    union = F.size(F.array_union("__inc_id_sh", "__corp_id_sh"))
    near_dupes = (
        cand.join(_sh(survivors, "__inc_id"), "__inc_id")
        .join(corp_sh, "__corp_id")
        .where((inter / F.greatest(union, F.lit(1))) >= threshold)
        .select(F.col("__inc_id").alias(id_col))
        .distinct()
    )
    return survivors.join(near_dupes, id_col, "left_anti")


def duplicate_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicate-span coverage — the exact-substring dedup
    signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499), restated over fixed-width token
    windows: the fraction of a document's token positions covered by at
    least one ``span``-token window whose exact text occurs in >=
    ``min_docs`` distinct documents.  Returns (id_col, n_tokens,
    covered_tokens); callers derive coverage = covered/n and use it to trim
    or drop boilerplate-heavy documents.

    Plan shape (the suffix-array substitute that stays hash-partitioned):
    tokens staged once, spans explode to (id, pos, md5(window)) and the
    frame is localCheckpoint'ed because two consumers follow (at corpus
    scale persist to disk or recompute — the stage is a narrow projection).
    Shuffle #1 groups on the 16-byte span key with a partial-aggregated
    distinct-doc count — keys move, text never does.  Duplicated keys join
    back on the same key partitioning; coverage re-expands each hit to its
    ``span`` positions and counts DISTINCT (id, pos) — shuffle #2, bounded
    by span x hits, not span x corpus.  No all-pairs comparison exists in
    the plan.  Fixed-width windows trade the suffix array's any-length
    guarantee for mergeable, partition-invariant hash aggregation: any
    duplicated run of >= span tokens is still fully covered (every window
    inside the run is duplicated), shorter duplicates are ignored by
    design.
    """
    # fan_out: the per-window md5 staging below is heavy narrow work that an
    # unsplittable single-row-group scan would run on one core
    toks = fan_out(df).select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    base = toks.select(F.col(id_col), F.size("__t").cast("bigint").alias("n_tokens"))
    grams = toks.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size("__t") >= span,
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - (span - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("__t", i, span))),
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
        ).alias("__p0", "__g"),
    ).localCheckpoint()
    dup_keys = (
        grams.groupBy("__g")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__g")
    )
    covered = (
        grams.join(dup_keys, "__g")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("__p0") + 1, F.col("__p0") + span)
            ).alias("__pos"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("covered_tokens"))
    )
    return base.join(covered, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce("covered_tokens", F.lit(0)).cast("bigint").alias("covered_tokens"),
    )


def paragraph_dedup(
    docs: DataFrame,
    para_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style paragraph-level dedup with document recomposition — [EXT]
    (Wenzek et al. 2020 §3.1: hash every paragraph, keep ONE occurrence
    corpus-wide, drop the rest, re-assemble each document from its surviving
    paragraphs).  The fixture corpus has no newlines, so a "paragraph" here
    is a fixed non-overlapping ``para_tokens``-token segment — the unit is a
    parameter; the operator (global first-occurrence keep + recompose) is
    the CCNet algorithm.

    Returns one row per input document:
    ``(id_col, n_paras, n_kept, kept_text)`` where ``kept_text`` is the
    space-joined surviving paragraphs in original order ('' if every
    paragraph of the document was a duplicate of an earlier one).

    Winner = lexicographic min ``(doc_id, pidx)`` per paragraph md5 —
    deterministic, engine-independent.

    Scale (100 TB): paragraphs stay rows (one explode, no all-pairs);
    winner selection is a groupBy on the 16-byte md5 with a min-struct
    aggregate — map-side partial combine absorbs mega-duplicated paragraphs
    (the boilerplate-header skew case) BEFORE the shuffle, which a
    row_number window could not; the keep-join back is hash-partitioned on
    the same key, so it reuses the aggregate's clustering.  The recompose
    groupBy shuffles only surviving paragraph text keyed by doc id.
    """
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    )
    paras = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.ceil(F.size("__t") / F.lit(float(para_tokens))).cast("int"),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice("__t", (i - F.lit(1)) * para_tokens + 1, para_tokens)
                ),
            )
        ).alias("__i0", "ptext"),
    ).select(
        F.col(id_col),
        (F.col("__i0") + 1).alias("pidx"),
        "ptext",
        F.md5("ptext").alias("__h"),
    )
    winners = paras.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col), F.col("pidx"))).alias("__w")
    )
    kept_flag = paras.join(winners, "__h").select(
        F.col(id_col),
        "pidx",
        "ptext",
        (
            (F.col("__w")[id_col] == F.col(id_col))
            & (F.col("__w.pidx") == F.col("pidx"))
        ).alias("__keep"),
    )
    return kept_flag.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_paras"),
        F.sum(F.col("__keep").cast("int")).cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("pidx", "ptext"))
                    )
                ),
                lambda s: s["ptext"],
            ),
        ).alias("kept_text"),
    )
