"""LLM-data-pipeline operator tests over the driver's documents/embeddings
tables (SURVEY.md §2.2 [EXT] operators)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.functions import text as T
from kafka_connect_expand_json_transform_spark.functions import vectors as V
from kafka_connect_expand_json_transform_spark.llmops import dedup, similarity, text_analysis
from kafka_connect_expand_json_transform_spark.llmops import multimodal
from kafka_connect_expand_json_transform_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([Row(t="The quick  brown fox jumps")])
    row = df.select(
        T.tokens("t").alias("toks"),
        T.word_shingles("t", 3).alias("sh"),
        T.token_count("t").alias("n"),
    ).first()
    assert row.toks == ["the", "quick", "brown", "fox", "jumps"]
    assert row.n == 5
    assert "the quick brown" in row.sh and len(row.sh) == 3


def test_short_text_shingle(spark):
    df = spark.createDataFrame([Row(t="one two")])
    assert df.select(T.word_shingles("t", 3).alias("s")).first().s == ["one two"]


def test_quality_metrics(spark):
    df = spark.createDataFrame([Row(t="the cat sat on the mat !!!")])
    row = df.select(
        F.round(T.stopword_ratio("t"), 3).alias("sw"),
        F.round(T.unique_token_ratio("t"), 3).alias("uq"),
        T.bpe_ish_token_count("t").alias("bpe"),
    ).first()
    assert row.sw == pytest.approx(2 / 7, abs=0.001)
    assert row.uq == pytest.approx(6 / 7, abs=0.001)
    assert row.bpe == 9  # 6 words + 3 '!'


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [Row(i=1, t="Hello  World"), Row(i=2, t="hello world"), Row(i=3, t="different")]
    )
    out = dedup.exact_dedup(df, "t", "i")
    assert sorted(r.i for r in out.collect()) == [1, 3]  # normalization folds 1&2


def test_minhash_identical_signatures(spark):
    df = spark.createDataFrame(
        [Row(i=1, t="a b c d e f g h"), Row(i=2, t="a b c d e f g h"), Row(i=3, t="x y z w v u t s")]
    )
    sigs = dedup.minhash_signatures(df, "t", "i", num_hashes=8)
    rows = {r.i: r.signature for r in sigs.collect()}
    assert rows[1] == rows[2] != rows[3]
    pairs = dedup.lsh_candidate_pairs(sigs, "i", num_bands=4).collect()
    assert (1, 2) in [(p.id_a, p.id_b) for p in pairs]


def test_minhash_dedup_pipeline(spark, docs):
    small = docs.limit(200)
    dup = small.withColumn("doc_id", F.col("doc_id") + 1_000_000)  # exact copies
    both = small.unionByName(dup)
    out = dedup.minhash_dedup(both, "text", "doc_id", threshold=0.9, num_hashes=8, num_bands=4)
    # every injected exact copy collapses onto its lower-id original...
    assert out.where(F.col("doc_id") >= 1_000_000).count() == 0
    # ...and the result matches deduping the originals alone (the corpus has
    # its own planted near-dups, so this is < small.count())
    base = dedup.minhash_dedup(small, "text", "doc_id", threshold=0.9, num_hashes=8, num_bands=4)
    assert out.count() == base.count() <= small.count()


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=10, id_b=11)]
    )
    comp = {r.id: r.component for r in dedup.connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_simhash_candidates(spark):
    df = spark.createDataFrame(
        [
            Row(i=1, t="the quick brown fox jumps over the lazy dog today"),
            Row(i=2, t="the quick brown fox jumps over the lazy dog tonight"),
            Row(i=3, t="completely unrelated text about spark query engines"),
        ]
    )
    cand = [(r.id_a, r.id_b) for r in dedup.simhash_dedup_candidates(df, "t", "i").collect()]
    assert (1, 2) in cand


def test_cosine_exprs(spark):
    df = spark.createDataFrame([Row(a=[1.0, 0.0], b=[0.0, 1.0]), Row(a=[1.0, 1.0], b=[1.0, 1.0])])
    got = df.select(F.round(V.cosine(F.col("a"), F.col("b")), 4).alias("c")).collect()
    assert [r.c for r in got] == [0.0, 1.0]


def test_brute_force_topk(spark, emb):
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 10  # 2 queries x 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != q for r in rs)  # self excluded


def test_lsh_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.lsh_topk(emb, queries, k=5, bits=4, num_tables=16)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"LSH recall {recall} collapsed"


def test_ivf_topk(spark, emb):
    assigned, centroids = similarity.build_ivf_index(emb, num_cells=8)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.brute_force_topk(emb, queries, k=3)
    approx = similarity.ivf_topk(assigned, centroids, queries, k=3, nprobe=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.5


def test_language_id_and_quality(spark, docs):
    out = text_analysis.language_id(text_analysis.profile_text_quality(docs))
    row = out.first()
    assert 0.0 <= row.quality <= 1.0
    assert row.lang_pred in text_analysis.LANG_PROFILES
    assert out.count() == docs.count()


def test_multimodal_plumbing(spark, docs):
    with_payload = multimodal.attach_binary_payload(docs.limit(20), "text")
    assert dict(with_payload.dtypes)["payload"] == "binary"
    feats = multimodal.extract_image_features(with_payload)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(0 <= r.img_width < 4096 for r in rows)
    # deterministic fake: same payload -> same features
    again = multimodal.extract_image_features(with_payload).collect()
    assert {(r.doc_id, r.img_width) for r in rows} == {(r.doc_id, r.img_width) for r in again}
    frames = multimodal.sample_frames(with_payload)
    assert frames.count() >= 20  # >=1 frame per doc
    assert dict(frames.dtypes)["frame_payload"] == "binary"


def test_multimodal_real_decode_rejects_non_images(spark, docs):
    """fake=False is a REAL decode now (stdlib/PIL, test_codecs.py) — text
    payloads are not images and must fail loudly, not hash-silently."""
    with_payload = multimodal.attach_binary_payload(docs.limit(1), "text")
    feats = multimodal.extract_image_features(with_payload, fake=False)
    with pytest.raises(Exception, match="cannot parse|cannot identify"):
        feats.collect()


def test_curation_pipeline_report(spark, docs):
    from kafka_connect_expand_json_transform_spark.llmops.curation import curate

    kept, report = curate(
        docs, min_quality=0.0, min_tokens=1, near_dup_threshold=0.8, with_report=True
    )
    assert report.n_input == docs.count()
    # each stage only removes rows
    assert (
        report.n_input
        >= report.n_after_quality
        >= report.n_after_exact_dedup
        >= report.n_after_near_dedup
        == kept.count()
    )
    # quality floor actually filters
    strict = curate(docs, min_quality=0.9, min_tokens=1)
    assert strict.count() <= report.n_after_near_dedup


def test_multimodal_resize_and_audio_plumbing(spark, docs):
    from kafka_connect_expand_json_transform_spark.llmops.multimodal import (
        AUDIO_FEATURE_DIM,
        attach_binary_payload,
        extract_audio_features,
        resize_images,
    )

    with_payload = attach_binary_payload(docs.limit(10), "text")
    resized = resize_images(with_payload, target_width=64, target_height=32)
    r = resized.first()
    assert (r["resized_width"], r["resized_height"]) == (64, 32)
    assert bytes(r["resized_payload"]) == bytes(r["payload"])  # fake passthrough

    audio = extract_audio_features(with_payload)
    a = audio.first()
    assert len(a["audio_features"]) == AUDIO_FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in a["audio_features"])
    # deterministic: same payload -> same features
    b = extract_audio_features(with_payload).first()
    assert a["audio_features"] == b["audio_features"]


def test_minhash_dedup_mass_duplicates_beyond_bucket_cap(spark):
    """300 copies of one text exceed max_bucket=200; star edges must keep
    the cluster connected so dedup still collapses it to one doc."""
    rows = [(i, "the same exact text repeated for the mass duplication test") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = dedup.minhash_dedup(df, "text", "doc_id", threshold=0.8)
    assert kept.count() == 1
    assert kept.first()["doc_id"] == 0


def test_connected_components_long_chain_converges(spark):
    """31-node chain: pointer jumping must converge inside the 10-round cap
    (pure neighbor-min propagation would need 30 rounds)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a int, id_b int"
    )
    comp = dedup.connected_components(edges, max_iterations=10)
    labels = {r["id"]: r["component"] for r in comp.collect()}
    assert set(labels.values()) == {0}


def test_sequence_packing_invariants(spark, docs):
    from kafka_connect_expand_json_transform_spark.llmops.packing import (
        pack_summary,
        sequence_pack,
    )

    packed = sequence_pack(docs, token_budget=256, num_buckets=8)
    # every doc assigned exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    summary = pack_summary(packed)
    # a pack overshoots the budget by at most one document's tokens
    max_doc = packed.agg(F.max("n_tokens")).first()[0]
    assert summary.where(F.col("total_tokens") > 256 + max_doc).count() == 0
    # packs are dense per bucket: ids 0..max contiguous
    from pyspark.sql import Window as W

    per_bucket = summary.groupBy("bucket").agg(
        F.count("*").alias("n_packs"), F.max("pack_id").alias("max_pack")
    )
    assert per_bucket.where(F.col("n_packs") != F.col("max_pack") + 1).count() == 0


def test_winnowing_fingerprints_edit_robust(spark):
    """Winnowing property: a local edit perturbs only nearby fingerprints —
    most fingerprints of the original survive in the edited doc."""
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    edited = base.replace("jumps", "leaps")
    df = spark.createDataFrame([(1, base), (2, edited)], "doc_id int, text string")
    fps = text_analysis.winnowing_fingerprints(df)
    a = {r["fingerprint"] for r in fps.where(F.col("doc_id") == 1).collect()}
    b = {r["fingerprint"] for r in fps.where(F.col("doc_id") == 2).collect()}
    overlap = len(a & b) / len(a)
    assert overlap > 0.5, overlap
    # identical docs -> identical fingerprint sets
    df2 = spark.createDataFrame([(1, base), (2, base)], "doc_id int, text string")
    fps2 = text_analysis.winnowing_fingerprints(df2)
    assert (
        fps2.groupBy("fingerprint").count().where(F.col("count") != 2).count() == 0
    )


def test_pq_shortlist_recall_and_compression(spark):
    """PQ contract: (a) codes are m small ints — the 32x index compression
    that makes embedding search memory-feasible at corpus scale; (b) a
    shortlist of 20% of the corpus recalls >= 80% of the true top-10
    (measured 95% on this fixture; margin for codebook sensitivity)."""
    import random

    import numpy as np

    from kafka_connect_expand_json_transform_spark.llmops import similarity as S
    from kafka_connect_expand_json_transform_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    books = S.train_pq_codebooks(emb, m=8, k=32)
    assert books.shape == (8, 32, 8)
    enc = S.pq_encode(emb, books).cache()
    first = enc.first()
    assert len(first["code"]) == 8  # 8 codes vs 64 floats
    vecs = {r[0]: np.array(r[1], dtype=float) for r in emb.select("vec_id", "embedding").collect()}
    random.seed(0)
    recalls = []
    for qid in random.sample(sorted(vecs), 5):
        qv = vecs[qid]
        qn = qv / np.linalg.norm(qv)
        sims = {i: float(qn @ (v / np.linalg.norm(v))) for i, v in vecs.items() if i != qid}
        true10 = set(sorted(sims, key=lambda i: (-sims[i], i))[:10])
        got = {r[0] for r in S.pq_topk(enc, books, qv, k=101).collect()} - {qid}
        recalls.append(len(true10 & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    # determinism: same seed -> same codebooks
    again = S.train_pq_codebooks(emb, m=8, k=32)
    assert np.array_equal(books, again)


def test_kmeans_quantized_separates_blobs(spark):
    # two well-separated blobs -> k=2 must split them exactly
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, (rng.normal(0.0, 0.05, 8) + (5.0 if i % 2 else -5.0)).tolist())
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigned = similarity.kmeans_quantized(df, k=2, iters=4)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    evens = {got[i] for i in range(0, 40, 2)}
    odds = {got[i] for i in range(1, 40, 2)}
    assert len(evens) == len(odds) == 1 and evens != odds
    # centroids land near +-5 on the quantized scale
    for vec in cents.values():
        assert all(abs(abs(v) - 50_000) < 5_000 for v in vec)


def test_kmeans_quantized_partition_invariant(spark):
    # exact integer arithmetic => identical result under any partitioning
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(0, 1, 16).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, a1 = similarity.kmeans_quantized(df.coalesce(1), k=5, iters=3)
    _, a32 = similarity.kmeans_quantized(df.repartition(32), k=5, iters=3)
    r1 = {r["vec_id"]: (r["cluster"], r["dist"]) for r in a1.collect()}
    r32 = {r["vec_id"]: (r["cluster"], r["dist"]) for r in a32.collect()}
    assert r1 == r32
    with pytest.raises(ValueError, match="k and iters"):
        similarity.kmeans_quantized(df, k=0)


def test_cluster_blocked_pairs_subset_and_blob_recall(spark):
    import numpy as np

    # three tight blobs: every within-blob pair has cos ~1 and must be found
    # (k-means separates blobs, so blocking loses nothing at high threshold)
    rng = np.random.default_rng(3)
    centers = [np.eye(6)[i] * 10 for i in range(3)]
    # ids interleaved (j*3 + b) so the k smallest ids — the deterministic
    # k-means seeds — land one per blob
    rows = [(j * 3 + b, (centers[b] + rng.normal(0, 0.01, 6)).tolist())
            for b in range(3) for j in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.cluster_blocked_pairs(df, threshold=0.99, k=3, iters=3)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    want = {(i * 3 + b, j * 3 + b) for b in range(3)
            for i in range(8) for j in range(i + 1, 8)}
    assert pairs == want  # full recall within blobs, nothing across blobs

    # on arbitrary data: blocked pairs are a strict subset of exact all-pairs
    # (precision 1 by construction — same cosine, same rounding)
    rnd = spark.createDataFrame(
        [(i, rng.normal(0, 1, 6).tolist()) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    blocked = {(r["id_a"], r["id_b"])
               for r in similarity.cluster_blocked_pairs(rnd, 0.3, k=4).collect()}
    exact = {(r["id_a"], r["id_b"])
             for r in similarity.cosine_pairs_above(rnd, 0.3).collect()}
    assert blocked <= exact


def test_dedup_against_corpus_tiers(spark):
    """Incremental dedup drops: exact copies of corpus docs, near-copies of
    corpus docs, and exact dups within the incoming batch — keeps novel
    docs and the first copy of batch-internal dups."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely unrelated corpus text about databases and engines")],
        "doc_id int, text string",
    )
    incoming = spark.createDataFrame(
        [
            (1, base),                              # exact copy of corpus 0 -> drop
            (3, base.replace("today", "tonight")),  # near-dup of corpus 0 -> drop
            (5, "a genuinely novel incoming document with fresh content here"),
            (7, "another brand new incoming doc talking about spark pipelines"),
            (9, "another brand new incoming doc talking about spark pipelines"),  # batch dup of 7
        ],
        "doc_id int, text string",
    )
    kept = dedup.dedup_against_corpus(
        incoming, corpus, "text", "doc_id", threshold=0.6, hash_family="md5"
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [5, 7]
    # exact-only mode keeps the near-copy
    kept_exact = dedup.dedup_against_corpus(
        incoming, corpus, "text", "doc_id", near=False
    )
    assert sorted(r["doc_id"] for r in kept_exact.collect()) == [3, 5, 7]


def test_dedup_against_saved_artifacts_matches_text_path(spark, tmp_path):
    """The 100 TB claim as API (VERDICT r03 ask#3): batch 2 deduped against
    batch 1's SAVED artifact tables (fingerprints/signatures/shingles round-
    tripped through parquet) must be byte-identical to deduping against the
    corpus text, and must not require the corpus text at all."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely unrelated corpus text about databases and engines")],
        "doc_id int, text string",
    )
    incoming = spark.createDataFrame(
        [
            (1, base),
            (3, base.replace("today", "tonight")),
            (5, "a genuinely novel incoming document with fresh content here"),
            (7, "another brand new incoming doc talking about spark pipelines"),
            (9, "another brand new incoming doc talking about spark pipelines"),
        ],
        "doc_id int, text string",
    )
    arts = dedup.corpus_artifacts(corpus, "text", "doc_id", hash_family="md5")
    # persist + reload: history contributes only artifact TABLES on disk
    loaded = {}
    for name, df in arts.items():
        p = str(tmp_path / name)
        df.write.mode("overwrite").parquet(p)
        loaded[name] = spark.read.parquet(p)
    via_art = dedup.dedup_against_corpus(
        incoming, None, "text", "doc_id", threshold=0.6, hash_family="md5",
        artifacts=loaded,
    )
    via_text = dedup.dedup_against_corpus(
        incoming, corpus, "text", "doc_id", threshold=0.6, hash_family="md5"
    )
    a = sorted(map(tuple, via_art.collect()))
    b = sorted(map(tuple, via_text.collect()))
    assert a == b
    assert [r[0] for r in a] == [5, 7]
    # artifacts=None AND corpus=None is a usage error, not a crash downstream
    import pytest as _pytest
    with _pytest.raises(ValueError, match="artifacts"):
        dedup.dedup_against_corpus(incoming, None, "text", "doc_id")


def test_bpe_train_matches_pure_python_reference(spark):
    """Property test: the distributed BPE trainer must agree with a 30-line
    pure-Python reference (same dotted representation, same adjacency
    counting, same str.replace merge, same tie-break) on adversarial little
    corpora — including repeated-letter words where overlapping-pair
    counting and non-overlapping merging diverge if either side is sloppy."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_connect_expand_json_transform_spark.llmops.bpe import (
        bpe_train,
        bpe_train_reference,
    )

    words_strategy = st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=5),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=8, deadline=None)
    @given(words_strategy)
    def check(word_freqs):
        df = spark.createDataFrame(
            [(w, f) for w, f in word_freqs.items()], "w string, f long"
        )
        assert bpe_train(df, rounds=3) == bpe_train_reference(word_freqs, rounds=3)

    check()


def test_gemm_topk_matches_fold_tier(spark, emb):
    """brute_force_topk_gemm must return the identical (query, id, cos, rank)
    rows as the interpreted-fold tier — the GEMM differs only in the last
    ulp, erased by round(4)."""
    queries = emb.where(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(map(tuple, similarity.brute_force_topk(emb, queries, k=3).collect()))
    b = sorted(
        map(tuple, similarity.brute_force_topk_gemm(emb, queries, k=3).collect())
    )
    assert a == b


def test_gemm_topk_string_ids_and_zero_norm_match_fold_tier(spark):
    """Tier-equivalence on degenerate inputs (VERDICT r03 wrong#4): string
    ids must not crash the GEMM tier (id schema now derives from the input),
    and a zero-norm vector must behave identically in both tiers — cosine
    is undefined, so it is NOT a candidate (and under ANSI mode the naive
    division would be a DIVIDE_BY_ZERO crash, not a quiet NaN)."""
    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("b", [0.9, 0.1, 0.0]),
        ("c", [0.0, 1.0, 0.0]),
        ("z", [0.0, 0.0, 0.0]),  # zero norm: cosine undefined -> excluded
        ("d", [0.5, 0.5, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id STRING, embedding ARRAY<DOUBLE>")
    queries = emb.where(F.col("vec_id").isin("a", "c", "z")).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def canon(df):
        return sorted(
            (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
            for r in df.collect()
        )

    a = canon(similarity.brute_force_topk(emb, queries, k=3))
    b = canon(similarity.brute_force_topk_gemm(emb, queries, k=3))
    assert a == b
    ids_in_results = {x[1] for x in a} | {x[0] for x in a}
    assert "z" not in ids_in_results  # zero-norm row absent from both sides
    assert len(a) == 2 * 3  # queries a and c each got a full top-3


def test_prefix_filter_prunes_and_loses_nothing(spark, docs):
    """The prefix filter's candidate set must (a) contain every true
    Jaccard>=0.6 pair (no false negatives — also proven vs the brute-force
    oracle in test_oracle_parity) and (b) be strictly smaller than the full
    inverted index's candidate set on the fixture — the whole point of
    indexing only the rare-end prefix."""
    from kafka_connect_expand_json_transform_spark.plans.queries import (
        prefix_filter_jaccard_pairs,
    )
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    arrayed = (
        docs.select("doc_id", T.tokens(F.col("text")).alias("__toks"))
        .where(F.size("__toks") >= 3)
        .select("doc_id", T.shingles_from_tokens("__toks", 3).alias("toks"))
    )
    ex = arrayed.select("doc_id", F.size("toks").alias("n"), F.explode("toks").alias("t"))
    full_cands = (
        ex.select(F.col("doc_id").alias("id_a"), "t")
        .join(ex.select(F.col("doc_id").alias("id_b"), "t"), "t")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    freq = ex.groupBy("t").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("t").asc())
    prefix = (
        ex.join(freq, "t")
        .withColumn("rnk", F.row_number().over(wdoc))
        .where(F.col("rnk") <= F.col("n") - F.expr("(3 * n + 4) DIV 5") + F.lit(1))
    )
    pref_cands = (
        prefix.select(F.col("doc_id").alias("id_a"), "t")
        .join(prefix.select(F.col("doc_id").alias("id_b"), "t"), "t")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    n_pref = pref_cands.count()
    assert n_pref < full_cands, (n_pref, full_cands)
    # every true pair is among the prefix candidates
    true_pairs = prefix_filter_jaccard_pairs(spark, sf).select("id_a", "id_b")
    missing = true_pairs.join(pref_cands, ["id_a", "id_b"], "left_anti").count()
    assert missing == 0


def test_split_oversized_blocks_caps_and_only_prunes(spark):
    """Hierarchical splitting (SCALE.md round-4 finding): auto-k fixes the
    MEAN cluster size but a skewed distribution still yields mega-clusters;
    ``max_cluster_size`` must (a) cap every block, (b) never invent pairs —
    the split run's output is a subset of the unsplit run's — and (c) stay
    deterministic run-to-run."""
    import numpy as np

    rng = np.random.default_rng(7)
    # skew: one 60-point spread-out mega-blob + two tight 5-point blobs.
    # k=3 clusters put ~60 points in one block — the Σ|b|² hot spot.
    rows = [(i, (np.eye(6)[0] * 10 + rng.normal(0, 2.0, 6)).tolist()) for i in range(60)]
    rows += [(100 + i, (np.eye(6)[2] * 10 + rng.normal(0, 0.01, 6)).tolist()) for i in range(5)]
    rows += [(200 + i, (np.eye(6)[4] * 10 + rng.normal(0, 0.01, 6)).tolist()) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    labeled = similarity.split_oversized_blocks(
        similarity.kmeans_quantized(df, k=3)[1]
        .select("vec_id", F.col("cluster").cast("string").alias("block")),
        df,
        max_cluster_size=20,
        target_cluster_size=10,
    )
    sizes = {r["block"]: r["n"] for r in
             labeled.groupBy("block").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == 70  # no row lost or duplicated
    assert max(sizes.values()) <= 20, sizes
    assert any("." in b for b in sizes)  # the mega-block actually split

    unsplit = {(r["id_a"], r["id_b"])
               for r in similarity.cluster_blocked_pairs(df, 0.5, k=3).collect()}
    split_df = similarity.cluster_blocked_pairs(
        df, 0.5, k=3, max_cluster_size=20, target_cluster_size=10
    )
    assert dict(split_df.dtypes)["cluster_id"] == "string"  # composite path
    split1 = {(r["id_a"], r["id_b"]) for r in split_df.collect()}
    split2 = {(r["id_a"], r["id_b"])
              for r in similarity.cluster_blocked_pairs(
                  df, 0.5, k=3, max_cluster_size=20, target_cluster_size=10).collect()}
    assert split1 == split2  # deterministic
    assert split1 <= unsplit  # splitting only prunes
    # the tight blobs were never oversized: their within-blob pairs survive
    tight = {(a, b) for (a, b) in unsplit if a >= 100 and b >= 100}
    assert tight and tight <= split1


def test_gopher_quality_flags_rule_semantics(spark):
    """Each Gopher rule trips on a crafted document and stays quiet on a
    clean one; the aggregate report is value-checked vs DuckDB in
    test_oracle_parity (gopher_quality_report)."""
    from kafka_connect_expand_json_transform_spark.llmops.curation import (
        gopher_quality_flags,
    )

    clean = "the cat sat and looked out over the wide green field toward " \
            "a tall old barn where birds often landed during warm summer " \
            "days and sang until the light slowly faded away into night"
    rows = [
        (1, clean),                                     # passes everything
        (2, "short text only"),                         # word count < 20
        (3, " ".join(["a"] * 30)),                      # mean len < 3, repetition
        (4, ("# " * 15) + " ".join(["the", "of", "word"] * 10)),  # symbols
        (5, " ".join(["123", "456"] * 15)),             # alpha + stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df).collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["flag_word_count"] is True
    assert got[3]["flag_mean_word_len"] and got[3]["flag_repetition"]
    assert got[4]["flag_symbol_ratio"] is True
    assert got[5]["flag_alpha_ratio"] and got[5]["flag_stopwords"]
    for d in (2, 3, 4, 5):
        assert got[d]["gopher_pass"] is False


def test_bpe_encode_matches_pure_python_reference(spark):
    """Property test: the expression-chain encoder must agree with its
    pure-Python twin on adversarial words (repeated letters hit the
    leftmost non-overlapping replace dialect) under a merge table that
    includes a merge-on-merged entry."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_connect_expand_json_transform_spark.llmops.bpe import (
        bpe_encode,
        bpe_encode_reference,
    )

    merges = [("a", "b"), ("b", "a"), ("ab", "a"), ("a", "ab")]

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.text(alphabet="ab", min_size=1, max_size=8),
                    min_size=1, max_size=8, unique=True))
    def check(words):
        df = spark.createDataFrame([(w,) for w in words], "w string")
        got = {r["w"]: (r["seq"], r["n_symbols"])
               for r in bpe_encode(df, merges).collect()}
        for w in words:
            seq = bpe_encode_reference(w, merges)
            n = len([s for s in seq.split(".") if s])
            assert got[w] == (seq, n), w

    check()


def test_bpe_encode_reproduces_trainer_final_state(spark):
    """encode(corpus, merges learned by bpe_train on that corpus) must land
    every word exactly where the trainer's own replace loop left it —
    the train/encode consistency contract in bpe_encode's docstring."""
    from kafka_connect_expand_json_transform_spark.llmops.bpe import (
        bpe_encode,
        bpe_train,
        bpe_train_reference,
    )

    word_freqs = {"stream": 5, "streams": 3, "steam": 2, "meter": 4, "ere": 6}
    df = spark.createDataFrame(list(word_freqs.items()), "w string, f long")
    learned = bpe_train(df, rounds=4)
    merges = [(a, b) for _, a, b, _ in learned]
    # trainer twin's final seqs, replayed merge by merge
    seqs = {f".{'.'.join(w)}.": w for w in word_freqs}
    final = {}
    for seq, w in seqs.items():
        s = seq
        for a, b in merges:
            s = s.replace(f".{a}.{b}.", f".{a}{b}.")
        final[w] = s
    got = {r["w"]: r["seq"] for r in bpe_encode(df, merges).collect()}
    assert got == final
    assert bpe_train_reference(word_freqs, rounds=4) == learned


def test_paragraph_dedup_keeps_first_and_recomposes(spark):
    """Hand-built corpus: doc 1 owns paragraphs A B; doc 2 repeats A then
    has C; doc 3 is A B again (fully duplicated).  With 2-token paragraphs
    the survivors must be exactly first-occurrence, in original order, and
    doc 3 must recompose to ''."""
    from kafka_connect_expand_json_transform_spark.llmops.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),          # paras: "aa bb"(A) "cc dd"(B)
            (2, "aa bb ee ff"),          # paras: A(dup) "ee ff"(C)
            (3, "aa bb cc dd"),          # paras: A(dup) B(dup)
            (4, "gg"),                   # short tail paragraph survives
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_text"])
        for r in paragraph_dedup(docs, para_tokens=2).collect()
    }
    assert out == {
        1: (2, 2, "aa bb cc dd"),
        2: (2, 1, "ee ff"),
        3: (2, 0, ""),
        4: (1, 1, "gg"),
    }


def test_c4_line_filter_rule_semantics(spark):
    """Hand-built docs hit each C4 rule exactly once; the per-source census
    is oracle-checked in test_oracle_parity (c4_line_filter_census)."""
    from kafka_connect_expand_json_transform_spark.llmops.curation import c4_line_filter

    lw = 4  # small lines so the fixtures stay readable
    docs = spark.createDataFrame(
        [
            # 3 clean 4-word lines -> kept page
            (0, "a b c d e f g h i j k l"),
            # blockword kills line 1; only 2 kept lines -> few_lines
            (1, "a slow c d e f g h i j k l"),
            # page blockword -> dropped outright (few_lines NOT also set)
            (2, "dup b c d e f g h i j k l"),
            # 13 words: tail line has 1 word -> short, 3 kept -> kept page
            (3, "a b c d e f g h i j k l m"),
            # empty text -> zero lines, few_lines
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in c4_line_filter(
            docs, line_words=lw, min_line_words=3, min_kept_lines=3
        ).collect()
    }
    assert got[0]["n_lines"] == 3 and got[0]["c4_keep"]
    assert got[0]["kept_words"] == 12 and got[0]["n_kept_lines"] == 3
    assert got[1]["n_blockword_lines"] == 1 and got[1]["flag_few_lines"]
    assert not got[1]["c4_keep"]
    assert got[2]["flag_page_blocklist"] and not got[2]["flag_few_lines"]
    assert not got[2]["c4_keep"]
    assert got[3]["n_lines"] == 4 and got[3]["n_short_lines"] == 1
    assert got[3]["c4_keep"] and got[3]["kept_words"] == 12
    assert got[4]["n_lines"] == 0 and got[4]["flag_few_lines"]
    assert not got[4]["c4_keep"]


def test_blocking_defaults_to_auto_k(spark, monkeypatch):
    """VERDICT r04 #1: k=None auto-derivation (k = max(8, n //
    target_cluster_size)) is the DEFAULT for cluster_blocked_pairs and
    semantic_dedup — the sf1 smoke measured fixed-k blocking quadratic
    (21x at 10x data, SCALE.md), so the linear-in-n rule must not be
    opt-in.  Explicit k still wins (the oracle queries pin k=8)."""
    import inspect
    import numpy as np

    assert inspect.signature(similarity.cluster_blocked_pairs).parameters["k"].default is None
    assert inspect.signature(similarity.semantic_dedup).parameters["k"].default is None

    seen = []
    orig = similarity.kmeans_quantized

    def spy(df, **kw):
        seen.append(kw.get("k"))
        return orig(df, **kw)

    monkeypatch.setattr(similarity, "kmeans_quantized", spy)
    rng = np.random.default_rng(11)
    df = spark.createDataFrame(
        [(i, rng.normal(0, 1, 4).tolist()) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    similarity.cluster_blocked_pairs(df, 0.99, target_cluster_size=10).collect()
    assert seen[-1] == 12  # max(8, 120 // 10): derived from n, not fixed 8
    similarity.cluster_blocked_pairs(df, 0.99, target_cluster_size=1000).collect()
    assert seen[-1] == 8   # floor: max(8, 0)
    # identical (corpus, params) now HITS the blocked-pairs memo — the
    # shared candidate stage never re-clusters...
    n_calls = len(seen)
    similarity.semantic_dedup(df, 0.99, target_cluster_size=10).count()
    assert len(seen) == n_calls  # memo reuse, no new Lloyd run
    # ...and with the memo cleared, semantic_dedup forwards auto-k
    similarity._PAIRS_MEMO.clear()
    similarity._KMEANS_MEMO.clear()
    similarity.semantic_dedup(df, 0.99, target_cluster_size=10).count()
    assert seen[-1] == 12  # semantic_dedup forwards the auto-k default
    similarity.cluster_blocked_pairs(df, 0.99, k=5).collect()
    assert seen[-1] == 5   # explicit k is untouched (oracle determinism)


def test_bpe_roundtrip_decode_inverts_encode(spark):
    """BPE losslessness: decode(encode(w)) == w for EVERY merge table —
    the contract that lets a 100 TB corpus be stored tokenized."""
    import random

    from kafka_connect_expand_json_transform_spark.llmops.bpe import (
        bpe_decode,
        bpe_encode,
        bpe_train,
    )

    rng = random.Random(5)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 12)))
             for _ in range(200)]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    trained = bpe_train(df.withColumn("f", F.lit(1)), rounds=8, word_col="w")
    merges = [(a, b) for _, a, b, _ in trained]
    out = bpe_decode(bpe_encode(df, merges))
    assert all(r["w"] == r["decoded"] for r in out.collect())
    # and with an empty merge table (pure character segmentation)
    out0 = bpe_decode(bpe_encode(df, []))
    assert all(r["w"] == r["decoded"] for r in out0.collect())


def test_minhash_signatures_parallelize_flag_is_value_identical(spark):
    """parallelize=False (the micro-batch gate, round 11) only skips the
    adaptive repartition — signatures must be byte-identical."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 11} tok{i % 5} tok{(i + 1) % 7} tok{i%3}")
         for i in range(60)],
        "doc_id bigint, text string",
    )
    on = {
        r["doc_id"]: list(r["signature"])
        for r in dedup.minhash_signatures(
            docs, "text", "doc_id", 8, 3, "xxhash"
        ).collect()
    }
    off = {
        r["doc_id"]: list(r["signature"])
        for r in dedup.minhash_signatures(
            docs, "text", "doc_id", 8, 3, "xxhash", parallelize=False
        ).collect()
    }
    assert on == off and len(on) == 60
