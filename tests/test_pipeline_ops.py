"""Unit tests for dataset splits/mixing, decontamination, repetition,
PII redaction, and CDC merge — the operator APIs behind the new queries
(their value-level parity is covered by test_oracle_parity)."""

import pytest

from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.llmops import decontamination, splits
from kafka_connect_expand_json_transform_spark.llmops.text_analysis import (
    redact_pii,
    repetition_metrics,
)
from kafka_connect_expand_json_transform_spark.operators.relational import merge_upsert


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in splits.hash_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in splits.hash_split(df.repartition(13)).collect()
    }
    assert a == b  # membership is a function of the id, not the partitioning
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # weights normalize: (8,1,1) == (0.8,0.1,0.1)
    c = {
        r["doc_id"]: r["split"]
        for r in splits.hash_split(
            df, (("train", 8.0), ("val", 1.0), ("test", 1.0))
        ).collect()
    }
    assert c == a


def test_hash_split_disjoint_covering(spark):
    df = _docs(spark, 100)
    out = splits.hash_split(df)
    assert out.count() == 100  # every row gets exactly one split


def test_stratified_sample_subset_and_rates(spark):
    df = _docs(spark, 1000)
    kept = splits.stratified_sample(df, "grp", {"0": 1.0, "1": 0.0}, id_col="doc_id")
    got = kept.groupBy("grp").count().collect()
    by = {r["grp"]: r["count"] for r in got}
    assert by.get("0") == 250  # fraction 1.0 keeps everything
    assert "1" not in by  # fraction 0.0 drops everything
    assert "2" not in by and "3" not in by  # default_fraction=0.0
    # kept set is a subset of the input and stable across calls
    again = splits.stratified_sample(df, "grp", {"0": 1.0, "1": 0.0})
    assert kept.exceptAll(again).count() == 0


def test_domain_mix_hits_target_shares(spark):
    # 300/100/100 rows; target 50/25/25 -> feasible N=400 -> 200/100/100
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 300, "a").when(F.col("id") < 400, "b").otherwise("c").alias("src"),
    )
    mixed = splits.domain_mix(df, "src", {"a": 0.5, "b": 0.25, "c": 0.25})
    by = {r["src"]: r["count"] for r in mixed.groupBy("src").count().collect()}
    assert by["b"] == 100 and by["c"] == 100  # rate-1.0 domains keep all
    assert abs(by["a"] - 200) < 40  # hash-sampled to ~2/3
    with pytest.raises(ValueError, match="absent"):
        splits.domain_mix(df, "src", {"a": 0.5, "zz": 0.5})


def test_decontaminate_drops_overlapping_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "totally unrelated text here now"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox runs away")], "doc_id long, text string"
    )
    rep = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in decontamination.contamination_report(train, bench, n=3).collect()
    }
    assert rep == {1: 1}  # shares the 3-gram "quick brown fox"
    clean = decontamination.decontaminate(train, bench, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_repetition_metrics_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "eight completely distinct words appear in here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_metrics(df, n=2).collect()}
    assert got[1]["dup_token_frac"] > 0.7  # 2 distinct / 8 tokens
    assert got[1]["top_ngram_frac"] > 0.5  # "buy now" dominates
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_ngram_frac"] < 0.2
    assert got[3]["n_tokens"] == 0 and got[3]["top_ngram_frac"] == 0.0


def test_redact_pii_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com and c@d.org ip 10.0.0.1 tel +1 555 123 4567")],
        "id long, text string",
    )
    row = redact_pii(df, "text").collect()[0]
    assert row["n_email"] == 2 and row["n_ipv4"] == 1 and row["n_phone"] == 1
    t = row["text"]
    assert "<EMAIL>" in t and "<IPV4>" in t and "<PHONE>" in t
    assert "a@b.com" not in t and "10.0.0.1" not in t


def test_merge_upsert_latest_change_wins(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 1),  # update
            (2, "b3", 22.0, "U", 2),  # later update wins
            (3, "c", 30.0, "D", 1),  # delete
            (4, "d", 40.0, "I", 1),  # insert
            (4, "d", 40.0, "D", 2),  # ...then deleted: never appears
        ],
        "k long, name string, v double, op string, seq int",
    )
    got = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(snap, changes, "k", "seq").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b3", 22.0)}


def test_tfidf_surfaces_distinctive_terms(spark):
    from kafka_connect_expand_json_transform_spark.llmops.text_analysis import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common common yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    top = {
        (r["doc_id"], r["term"]): r["tfidf"] for r in tfidf_top_terms(df, k=1).collect()
    }
    # the rare term wins in docs 1 and 2; doc 3 only has the common term
    assert set(top) == {(1, "zebra"), (2, "yak"), (3, "common")}
    assert top[(1, "zebra")] > 0 and top[(3, "common")] == 0.0


def test_hll_estimate_close_to_exact(spark):
    from kafka_connect_expand_json_transform_spark.operators.sketches import (
        distinct_estimate_report,
        hll_partials,
        hll_rollup,
    )
    from pyspark.sql import functions as F

    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 2).alias("sub"),
        (F.col("id") % 5000).alias("v"),
    )
    est = {
        r["g"]: r["n_distinct_est"]
        for r in distinct_estimate_report(df, ["g", "sub"], ["g"], "v").collect()
    }
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05
    # partials are mergeable: rollup of partials == rollup of finer partials
    parts = hll_partials(df, ["g", "sub"], "v")
    again = {r["g"]: r["n_distinct_est"] for r in hll_rollup(parts, ["g"]).collect()}
    assert again == est


def test_expand_json_nested_paths(spark):
    from pyspark.sql.types import StructType
    from kafka_connect_expand_json_transform_spark.operators.expand_json import (
        expand_json,
        expand_json_nested,
    )

    df = spark.createDataFrame(
        [(1, ("a", '{"x": 1, "y": "z"}'))],
        "id long, meta struct<tag string, payload string>",
    )
    out = expand_json_nested(df, ["meta.payload"])
    row = out.collect()[0]
    assert row["meta"]["tag"] == "a"  # sibling leaf untouched
    assert row["meta"]["payload"]["x"] == 1 and row["meta"]["payload"]["y"] == "z"
    ptype = out.schema["meta"].dataType["payload"].dataType
    assert isinstance(ptype, StructType)
    # the faithful core still rejects dotted paths (readme.md:25)
    with pytest.raises(ValueError, match="nested field path"):
        expand_json(df, fields=["meta.payload"])
    with pytest.raises(ValueError, match="root-level"):
        expand_json_nested(df, ["id"])


def test_gap_fill_zero_and_locf(spark):
    import datetime as dt

    from kafka_connect_expand_json_transform_spark.operators.timeseries import gap_fill

    t0 = dt.datetime(2024, 1, 1, 0)
    rolled = spark.createDataFrame(
        [
            ("a", t0, 1, 10.0),
            ("a", t0 + dt.timedelta(hours=3), 2, 30.0),  # 2-hour gap
            ("b", t0, 5, 50.0),
        ],
        "k string, bucket timestamp, n long, total double",
    )
    out = gap_fill(
        rolled, ["k"], step_seconds=3600, fill={"n": "zero", "total": "locf"}
    )
    rows = {(r["k"], r["bucket"].hour): (r["n"], r["total"]) for r in out.collect()}
    assert rows[("a", 0)] == (1, 10.0)
    assert rows[("a", 1)] == (0, 10.0)  # zero-filled count, carried total
    assert rows[("a", 2)] == (0, 10.0)
    assert rows[("a", 3)] == (2, 30.0)
    assert rows[("b", 0)] == (5, 50.0)
    assert len(rows) == 5  # b has no spine beyond its single bucket
    with pytest.raises(ValueError, match="fill targets"):
        gap_fill(rolled, ["k"], fill={"nope": "zero"})


def test_dataset_diff_statuses(spark):
    from kafka_connect_expand_json_transform_spark.operators.relational import (
        dataset_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 20.0), (3, 31.0), (4, 40.0)], "k long, v double"
    )
    got = {
        r["k"]: r["diff_status"] for r in dataset_diff(old, new, "k").collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_cap_per_group_deterministic(spark):
    df = _docs(spark, 400)
    capped = splits.cap_per_group(df, "grp", 5)
    by = {r["grp"]: r["count"] for r in capped.groupBy("grp").count().collect()}
    assert all(v == 5 for v in by.values()) and len(by) == 4
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in splits.cap_per_group(df.repartition(7), "grp", 5).collect())
    assert a == b  # kept set invariant under repartitioning


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources.batch import (
        read_orc,
        write_orc,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    p = str(tmp_path / "t.orc")
    write_orc(df, p)
    back = read_orc(spark, p).where(F.col("g") == 3).select("id")
    assert back.count() == 14  # ids 3, 10, ..., 94
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "ReadSchema: struct<id:bigint,g:bigint>" in plan


def test_parquet_schema_evolution(spark, tmp_path):
    from kafka_connect_expand_json_transform_spark.sources.batch import (
        read_parquet_evolving,
    )

    v1 = str(tmp_path / "lake/batch=1")
    v2 = str(tmp_path / "lake/batch=2")
    spark.range(3).select(F.col("id")).write.parquet(v1)
    spark.range(3).select(F.col("id"), F.lit("en").alias("lang")).write.parquet(v2)
    merged = read_parquet_evolving(spark, v1, v2)
    assert set(merged.columns) == {"id", "lang"}
    assert merged.count() == 6
    assert merged.where(F.col("lang").isNull()).count() == 3  # old files: NULL


def test_merge_upsert_idempotent(spark):
    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [(2, 21.0, "U", 1), (3, 30.0, "D", 1), (4, 40.0, "U", 1)],
        "k long, v double, op string, seq int",
    )
    once = merge_upsert(snap, changes, "k", "seq")
    twice = merge_upsert(once, changes, "k", "seq")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_sorted_parquet_layout_skips_row_groups(spark, tmp_path):
    """write_sorted_parquet must produce files with disjoint key ranges and
    narrow row-group stats, and Spark must skip non-matching files/groups on
    a point read (the no-index data-skipping contract at scale)."""
    import os

    import pyarrow.parquet as pq
    from kafka_connect_expand_json_transform_spark.sources.batch import (
        load_table,
        write_sorted_parquet,
    )

    out = str(tmp_path / "orders_by_custkey")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    write_sorted_parquet(orders, out, ["o_custkey"], n_files=4)

    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) == 4
    # per-file key ranges are pairwise disjoint (range partitioning)...
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_custkey"
        )
        stats = [md.row_group(g).column(col_idx).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # ...so a point predicate matches exactly one file
    # and the point read returns correct results through the pushed filter
    key = orders.select("o_custkey").first()[0]
    got = spark.read.parquet(out).where(F.col("o_custkey") == key).count()
    want = orders.where(F.col("o_custkey") == key).count()
    assert got == want > 0


def test_weighted_sample_is_partition_invariant_and_rate_correct(spark):
    """weighted_sample membership must not depend on physical partitioning,
    and the realized rate must track the mean weight (it's an exact
    per-row Bernoulli with hash-uniform draws)."""
    from kafka_connect_expand_json_transform_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    w = F.least(F.length("text") / F.lit(2000.0), F.lit(1.0))
    dw = docs.withColumn("w", w)
    base = {r[0] for r in splits.weighted_sample(dw, "w").select("doc_id").collect()}
    re32 = {
        r[0]
        for r in splits.weighted_sample(dw.repartition(32), "w").select("doc_id").collect()
    }
    assert base == re32
    mean_w = dw.agg(F.avg("w")).first()[0]
    n_total = dw.count()
    rate = len(base) / n_total
    assert abs(rate - mean_w) < 0.05  # 3-sigma at n>=1000 is well under this
    # weight 0 drops everything; weight 1 keeps everything
    assert splits.weighted_sample(dw.withColumn("w", F.lit(0.0)), "w").count() == 0
    assert splits.weighted_sample(dw.withColumn("w", F.lit(1.0)), "w").count() == n_total


def test_approx_heavy_hitters_covers_true_top_half(spark):
    """The sketch's top-k must contain every true top-k/2 value (standard
    heavy-hitter guarantee at this tracked-items budget) and its counts must
    be within 2% of exact for those values."""
    from kafka_connect_expand_json_transform_spark.operators.profiling import (
        approx_heavy_hitters,
        heavy_hitters,
    )
    from kafka_connect_expand_json_transform_spark.sources.batch import load_table
    from kafka_connect_expand_json_transform_spark.functions import text as TXT

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    toks = docs.select(F.explode(TXT.tokens(F.col("text"))).alias("tok"))
    exact = {r["value"]: r["n"] for r in heavy_hitters(toks, "tok", 20).collect()}
    approx = {r["value"]: r["n"] for r in approx_heavy_hitters(toks, "tok", 20).collect()}
    top10 = sorted(exact, key=lambda v: (-exact[v], v))[:10]
    for v in top10:
        assert v in approx, (v, sorted(approx))
        assert abs(approx[v] - exact[v]) <= max(2, 0.02 * exact[v])


def test_compact_parquet_reduces_file_count_preserving_rows(spark, tmp_path):
    import os

    from kafka_connect_expand_json_transform_spark.sources.batch import (
        compact_parquet,
        load_table,
    )

    frag, out = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    orders.repartition(64).write.mode("overwrite").parquet(frag)  # 64 tiny files
    n_in = sum(f.endswith(".parquet") for f in os.listdir(frag))
    assert n_in == 64
    compact_parquet(spark, frag, out, target_file_bytes=10 * 1024 * 1024)
    n_out = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_out < 8  # ~300KB of data -> one 10MB-target file (plus slack)
    a = spark.read.parquet(out)
    assert a.count() == orders.count()
    assert a.exceptAll(orders).count() == 0 and orders.exceptAll(a).count() == 0


def test_quantile_sketch_accuracy_and_merge(spark):
    from kafka_connect_expand_json_transform_spark.operators.sketches import (
        quantile_partials,
        quantile_rollup,
    )

    # two groups with disjoint, known distributions
    rows = [("a", float(i)) for i in range(10_000)] + [
        ("b", 1000.0 + (i % 100)) for i in range(5_000)
    ]
    df = spark.createDataFrame(rows, "g string, v double").repartition(16)
    parts = quantile_partials(df, ["g"], "v", m=128)
    # partials are small: each <= 128 centroids
    sizes = parts.select(F.size("q_means").alias("s")).collect()
    assert all(r["s"] <= 128 for r in sizes)
    out = {r["g"]: r for r in quantile_rollup(parts, ["g"], [0.5, 0.99], m=128).collect()}
    assert out["a"]["q_count"] == 10_000 and out["b"]["q_count"] == 5_000
    # uniform[0,10000): p50 ~ 5000, p99 ~ 9900; rank error ~2/128 -> +-~200
    assert abs(out["a"]["p50"] - 5000) < 250
    assert abs(out["a"]["p99"] - 9900) < 250
    assert 1000 <= out["b"]["p50"] <= 1100  # groups don't bleed into each other

    # mergeability: sketching two halves separately then rolling up together
    # lands within the same error bound as the single-pass sketch
    h1 = quantile_partials(df.where("v < 2500 or g = 'b'"), ["g"], "v", m=128)
    h2 = quantile_partials(df.where("v >= 2500 and g = 'a'"), ["g"], "v", m=128)
    merged = {
        r["g"]: r
        for r in quantile_rollup(h1.unionByName(h2), ["g"], [0.5, 0.99], m=128).collect()
    }
    assert merged["a"]["q_count"] == 10_000
    assert abs(merged["a"]["p50"] - 5000) < 250
    assert abs(merged["a"]["p99"] - 9900) < 250


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """Z-order contract: every file covers a narrow range of BOTH clustered
    columns, so a narrow predicate on either one is covered by a minority of
    files (single-column sort leaves the second column unprunable)."""
    import os

    import pyarrow.parquet as pq
    from kafka_connect_expand_json_transform_spark.sources.batch import (
        load_table,
        write_sorted_parquet,
        write_zorder_parquet,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zorder_parquet(ev, zdir, ["user_id", "value"], bits=4, n_files=16)
    write_sorted_parquet(ev, sdir, ["user_id"], n_files=16)

    def file_ranges(d, col):
        out = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            ci = next(i for i in range(md.num_columns)
                      if md.row_group(0).column(i).path_in_schema == col)
            st = [md.row_group(g).column(ci).statistics for g in range(md.num_row_groups)]
            out.append((min(s.min for s in st), max(s.max for s in st)))
        return out

    stats = ev.agg(
        F.expr("approx_percentile(user_id, 0.5)"), F.expr("approx_percentile(value, 0.5)")
    ).first()
    uid_mid, val_mid = stats[0], float(stats[1])

    def covering(ranges, p):
        return sum(1 for lo, hi in ranges if lo <= p <= hi)

    zu = covering(file_ranges(zdir, "user_id"), uid_mid)
    zv = covering(file_ranges(zdir, "value"), val_mid)
    assert zu <= 8, f"z-order should skip most files on user_id, covered {zu}/16"
    assert zv <= 8, f"z-order should skip most files on value, covered {zv}/16"
    # the single-sort layout cannot skip on the non-sort column
    sv = covering(file_ranges(sdir, "value"), val_mid)
    assert sv >= 12, f"expected near-universal coverage on value for plain sort, got {sv}"
    # correctness through the layout: filtered read matches the source
    want = ev.where((F.col("user_id") == uid_mid)).count()
    got = spark.read.parquet(zdir).where(F.col("user_id") == uid_mid).count()
    assert got == want > 0
    with pytest.raises(ValueError, match="2 columns"):
        write_zorder_parquet(ev, zdir, ["user_id"])


def test_chunk_documents_overlap_invariants(spark):
    from kafka_connect_expand_json_transform_spark.llmops.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [("a", words), ("b", "one two"), ("c", None)], "doc_id string, text string"
    )
    out = chunk_documents(df, chunk_tokens=4, stride=2)
    rows = {(r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
            for r in out.collect()}
    # 10 tokens, w=4, s=2 -> chunks at 0,2,4,6 (last full) -> extra = ceil(6/2)=3
    a_ids = sorted(cid for d, cid in rows if d == "a")
    assert a_ids == [0, 1, 2, 3]
    assert rows[("a", 0)] == (4, "w0 w1 w2 w3")
    assert rows[("a", 3)] == (4, "w6 w7 w8 w9")
    # consecutive chunks overlap by w - s tokens
    assert rows[("a", 0)][1].split()[2:] == rows[("a", 1)][1].split()[:2]
    # short doc -> single chunk; null doc -> one empty chunk, id preserved
    assert rows[("b", 0)] == (2, "one two")
    assert rows[("c", 0)] == (0, "")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)


def test_dataset_checksum_invariance_and_sensitivity(spark):
    from kafka_connect_expand_json_transform_spark.operators.relational import (
        dataset_checksum,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id int, s string"
    )
    base = dataset_checksum(df).collect()[0]
    shuffled = dataset_checksum(df.repartition(8).orderBy(F.rand(7))).collect()[0]
    assert (base["n"], base["checksum"]) == (shuffled["n"], shuffled["checksum"])
    changed = dataset_checksum(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, None)], "id int, s string")
    ).collect()[0]
    assert changed["checksum"] != base["checksum"]
    # NULL is not the empty string
    empt = dataset_checksum(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "")], "id int, s string")
    ).collect()[0]
    assert empt["checksum"] != base["checksum"]


def test_pseudonymize_deterministic_join_preserving(spark):
    from kafka_connect_expand_json_transform_spark.llmops.text_analysis import (
        pseudonymize,
    )

    a = spark.createDataFrame([(1, "alice"), (2, None)], "id int, user string")
    b = spark.createDataFrame([(10, "alice")], "other int, user string")
    pa, pb = pseudonymize(a, ["user"], "s1"), pseudonymize(b, ["user"], "s1")
    joined = pa.join(pb, "user").collect()
    assert len(joined) == 1 and joined[0]["id"] == 1  # same salt -> joinable
    assert pa.where("id = 2").collect()[0]["user"] is None  # NULL stays NULL
    other_salt = pseudonymize(a, ["user"], "s2").where("id = 1").collect()[0]["user"]
    assert other_salt != pa.where("id = 1").collect()[0]["user"]


def test_constraint_report_null_counts_as_violation(spark):
    from kafka_connect_expand_json_transform_spark.operators.profiling import (
        constraint_report,
    )

    df = spark.createDataFrame([(1,), (None,), (-5,)], "v int")
    out = {r["constraint_name"]: (r["n_rows"], r["n_violations"])
           for r in constraint_report(df, {"v_positive": F.col("v") > 0}).collect()}
    # NULL > 0 is NULL -> counted as a violation alongside -5
    assert out == {"v_positive": (3, 2)}
    with pytest.raises(ValueError, match="no constraints"):
        constraint_report(df, {})


def test_scd2_versions_tile_the_timeline(spark):
    """SCD2 invariants on the declared query: per user, versions are 1..k
    contiguous, valid ranges chain exactly (valid_to == next valid_from),
    only the last version is open, and adjacent versions never repeat a
    state (run-length property)."""
    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES

    rows = (
        QUERIES["scd2_user_state"](spark, "/root/testdata/sf0.001")
        .orderBy("user_id", "version")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, vs in by_user.items():
        assert [v["version"] for v in vs] == list(range(1, len(vs) + 1)), user
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], user
            assert a["state"] != b["state"], user  # run-length compressed
        assert vs[-1]["valid_to_us"] is None, user
        assert all(v["valid_to_us"] is not None for v in vs[:-1]), user


def test_attribution_conserves_purchase_revenue(spark):
    """Every purchase with a preceding non-purchase event is attributed to
    exactly one channel: attributed revenue + unattributed (purchase-first
    users' leading purchases) == total purchase revenue, in exact cents."""
    from pyspark.sql import Window

    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES
    from kafka_connect_expand_json_transform_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    attributed = (
        QUERIES["last_touch_attribution"](spark, sf)
        .agg(F.sum((F.col("attributed_revenue") * 100).cast("bigint")))
        .collect()[0][0]
    )
    ev = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(ts)"), "event_id")
        .rowsBetween(-1000000, -1)
    )
    cents = (F.col("value").cast("decimal(8,2)") * 100).cast("bigint")
    flagged = ev.select(
        "event_type",
        cents.alias("cents"),
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w).alias("channel"),
    ).filter(F.col("event_type") == "purchase")
    total = flagged.agg(F.sum("cents")).collect()[0][0]
    unattributed = (
        flagged.filter(F.col("channel").isNull()).agg(F.sum("cents")).collect()[0][0]
        or 0
    )
    assert attributed + unattributed == total


def test_psi_zero_for_identical_distributions(spark):
    """PSI's exact-arithmetic path: comparing a distribution against itself
    must give psi == 0 and every per-bin term == 0 (the quantized ln of a
    ratio of identical integer products is ln(1) -> floor(0) == 0)."""
    from pyspark.sql import Window

    df = spark.range(1000).select(
        (F.col("id") % 10).alias("bin"),
        F.lit(1).alias("nb"),
        F.lit(1).alias("nc"),
    )
    b = df.groupBy("bin").agg(F.sum("nb").alias("nb"), F.sum("nc").alias("nc"))
    wall = Window.partitionBy()
    t = b.select(
        "bin", "nb", "nc",
        F.sum("nb").over(wall).alias("tb"),
        F.sum("nc").over(wall).alias("tc"),
    )
    ratio = (F.col("nc") * F.col("tb")).cast("double") / (
        F.col("nb") * F.col("tc")
    ).cast("double")
    terms = t.select(
        (
            (F.col("nc") * F.col("tb") - F.col("nb") * F.col("tc"))
            * F.floor(F.ln(ratio) * 1000000).cast("bigint")
        ).alias("term")
    ).collect()
    assert all(r["term"] == 0 for r in terms)


def test_read_csv_and_json_sources(spark, tmp_path):
    """Direct coverage of the CSV/JSON batch sources (SURVEY.md §2.2
    sources): CSV honors an explicit schema + delimiter without the
    inference pass; JSON PERMISSIVE nulls corrupt records while FAILFAST
    raises — the reference's DataException analogue at the source layer."""
    import pytest as _pytest

    from kafka_connect_expand_json_transform_spark.sources.batch import (
        read_csv,
        read_json,
    )

    csv_path = str(tmp_path / "t.csv")
    with open(csv_path, "w") as f:
        f.write("id|name\n1|alpha\n2|beta\n")
    got = read_csv(
        spark, csv_path, schema="id int, name string", sep="|"
    ).collect()
    assert {(r["id"], r["name"]) for r in got} == {(1, "alpha"), (2, "beta")}

    json_path = str(tmp_path / "t.jsonl")
    with open(json_path, "w") as f:
        f.write('{"k": 1}\n{"k": 2\n{"k": 3}\n')  # middle line corrupt
    ok = read_json(spark, json_path, schema="k int").collect()
    assert sorted(r["k"] for r in ok if r["k"] is not None) == [1, 3]
    assert sum(1 for r in ok if r["k"] is None) == 1

    with _pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        read_json(spark, json_path, schema="k int", mode="FAILFAST").collect()


def test_bpe_merge_rounds_invariants(spark):
    """Merging the top pair can only shrink any other pair's count (a new
    pair that involves the merged symbol maps 1:1 onto occurrences of the
    old triple), so the winning count must be non-increasing across rounds;
    pairs must be distinct and weights positive."""
    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES

    rows = (
        QUERIES["bpe_merge_rounds"](spark, "/root/testdata/sf0.001")
        .orderBy("round")
        .collect()
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    ns = [r["n_weighted"] for r in rows]
    assert ns == sorted(ns, reverse=True), ns
    assert all(n > 0 for n in ns)
    pairs = [(r["pair_a"], r["pair_b"]) for r in rows]
    assert len(set(pairs)) == 3, pairs


def test_ewma_weight_arithmetic(spark):
    """The bit-shift weights must telescope exactly: a full 16-deep window
    has denominator 2^16 - 1; the first observation of a user is its own
    EWMA (den = 2^15, num = cents * 2^15); every EWMA lies within the
    user's observed [min, max] cents."""
    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES

    rows = QUERIES["ewma_purchase_values"](spark, "/root/testdata/sf0.001").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["event_id"])
        first = rs[0]
        assert first["ewma_den"] == 1 << 15
        assert first["ewma_num"] == first["cents"] * (1 << 15)
        for i, r in enumerate(rs):
            if i >= 15:
                assert r["ewma_den"] == (1 << 16) - 1
            window = [x["cents"] for x in rs[max(0, i - 15) : i + 1]]
            assert min(window) <= r["ewma_cents"] <= max(window), (u, i)


def test_gap_fill_interp_exact_and_boundaries(spark):
    """Linear interpolation must hit the exact integer points between the
    surrounding OBSERVED buckets (not adjacent spine rows), and leave
    leading/trailing gaps NULL."""
    from kafka_connect_expand_json_transform_spark.operators.timeseries import gap_fill

    rolled = spark.createDataFrame(
        [
            ("a", "2024-01-01 01:00:00", 100),
            ("a", "2024-01-01 04:00:00", 400),   # 3h gap: 2 missing buckets
            ("a", "2024-01-01 06:00:00", 100),   # then 1 missing bucket
        ],
        "k string, bucket string, cents long",
    ).select("k", F.col("bucket").cast("timestamp").alias("bucket"), "cents")
    out = gap_fill(rolled, ["k"], fill={"cents": "interp"})
    rows = {r["bucket"].hour: r["cents"] for r in out.collect()}
    assert rows == {1: 100, 2: 200, 3: 300, 4: 400, 5: 250, 6: 100}


def test_duplicate_span_coverage_known_answer(spark):
    """Two docs share one verbatim 8-token run inside longer unique text;
    a third doc is all-unique. Exactly the shared run's positions count as
    covered in both sharers, nothing else."""
    from kafka_connect_expand_json_transform_spark.llmops.dedup import (
        duplicate_span_coverage,
    )

    shared = " ".join(f"dup{i}" for i in range(8))  # one 8-token window
    rows = [
        (1, f"alpha beta {shared} gamma delta"),            # 12 tokens, 8 covered
        (2, f"{shared} omega psi chi phi"),                 # 12 tokens, 8 covered
        (3, " ".join(f"uniq{i}" for i in range(12))),       # 12 tokens, 0 covered
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in duplicate_span_coverage(df, "text", "doc_id", span=8).collect()
    }
    assert got == {1: (12, 8), 2: (12, 8), 3: (12, 0)}


def test_duplicate_span_coverage_overlapping_windows_union(spark):
    """A 9-token duplicated run contains two overlapping duplicated 8-token
    windows; coverage counts the union of positions (9), not 2 x 8."""
    from kafka_connect_expand_json_transform_spark.llmops.dedup import (
        duplicate_span_coverage,
    )

    run = " ".join(f"r{i}" for i in range(9))
    df = spark.createDataFrame(
        [(1, f"{run} tail1 tail2"), (2, f"head1 {run}")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in duplicate_span_coverage(df, "text", "doc_id", span=8).collect()
    }
    assert got == {1: (11, 9), 2: (10, 9)}


def test_duplicate_span_coverage_short_docs_ignored(spark):
    """Docs shorter than the span emit no windows (never a descending
    sequence artifact) but still report their token counts."""
    from kafka_connect_expand_json_transform_spark.llmops.dedup import (
        duplicate_span_coverage,
    )

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in duplicate_span_coverage(df, "text", "doc_id", span=8).collect()
    }
    assert got == {1: (2, 0), 2: (2, 0)}
