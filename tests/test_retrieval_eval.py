"""Unit tests for the session-3 retrieval/eval/stats operators beyond their
DuckDB parity checks: known-answer shapes and bound invariants that a
value-matched-but-wrong-formula implementation would fail."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.plans.queries import (
    _NDCG_ICUM,
    _NDCG_W,
    _RRF_W,
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_ndcg_weights_match_formula():
    for i, w in enumerate(_NDCG_W, start=1):
        assert w == math.floor(1_000_000 / math.log2(i + 1)), (i, w)
    assert _NDCG_W[0] == 1_000_000  # log2(2) = 1 exactly
    assert _NDCG_ICUM[-1] == sum(_NDCG_W)
    assert all(a > b for a, b in zip(_NDCG_W, _NDCG_W[1:]))  # discounts decrease


def test_rrf_weights_match_formula():
    assert _RRF_W == [1_000_000_000 // (60 + i) for i in range(1, 11)]
    assert all(a > b for a, b in zip(_RRF_W, _RRF_W[1:]))


def test_ndcg_bounds_and_schema(spark):
    rows = QUERIES["ndcg_label_retrieval"](spark, SF).collect()
    assert rows, "expected one row per query vector"
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-12, r
        if r.n_rel == 0:
            assert r.ndcg == 0.0


def test_mmr_first_pick_is_top_cosine(spark):
    """Pick 1 must equal the plain cosine argmax (no diversity penalty on an
    empty picked set), and later picks never repeat a vec_id."""
    out = QUERIES["mmr_diversified_topk"](spark, SF).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, {})[r.pick] = r.vec_id
    top = QUERIES["cosine_topk"](spark, SF).where(F.col("rank") == 1).collect()
    top1 = {r.query_id: r.vec_id for r in top}
    for q, picks in by_q.items():
        assert picks[1] == top1[q], (q, picks, top1)
        assert len(set(picks.values())) == len(picks)


def test_silhouette_bounds(spark):
    rows = QUERIES["silhouette_kmeans_clusters"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.mean_silhouette <= 1.0 + 1e-9, r
        # centroid silhouette with argmin assignment is non-negative
        assert r.sum_s_micro >= 0, r


def test_calibration_bins_cover_all_orders(spark):
    rows = QUERIES["calibration_bins"](spark, SF).collect()
    assert {r.bin for r in rows} == set(range(10))
    for r in rows:
        assert 0.0 <= r.mean_pred <= 1.0
        assert 0.0 <= r.pos_rate <= 1.0


def test_welch_and_anova_are_finite(spark):
    w = QUERIES["welch_t_test_values"](spark, SF).collect()[0]
    assert math.isfinite(w.t_stat) and math.isfinite(w.welch_df)
    assert w.welch_df <= w.n1 + w.n2 - 2 + 1e-9  # Welch df never exceeds pooled df
    a = QUERIES["anova_event_values"](spark, SF).collect()[0]
    assert math.isfinite(a.f_stat) and a.f_stat >= 0
    assert a.ssb >= -1e-6 and a.ssw >= -1e-6
    assert a.k == 5


def test_spearman_in_range(spark):
    r = QUERIES["spearman_spend_orders"](spark, SF).collect()[0]
    assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9


def test_position_attribution_conserves_revenue(spark):
    """Total attributed micro-cents must equal 1e6 x the total cents of
    attributed first purchases (the 40/20/40 split conserves credit
    exactly, including the remainder-dust assignment)."""
    out = QUERIES["position_attribution"](spark, SF).collect()
    total_micro = sum(r.attributed_micro_cents for r in out)
    from kafka_connect_expand_json_transform_spark.sources.batch import load_table

    e = load_table(spark, SF, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT)").alias("cents"),
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("user_id").orderBy("us", "event_id")
    fp = (
        e.where(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
    )
    touched = (
        e.where(F.col("event_type") != "purchase")
        .join(
            fp.select("user_id", F.col("us").alias("pus"),
                      F.col("event_id").alias("pid"), F.col("cents").alias("pc")),
            "user_id",
        )
        .where(
            (F.col("us") < F.col("pus"))
            | ((F.col("us") == F.col("pus")) & (F.col("event_id") < F.col("pid")))
        )
        .select("user_id", "pc")
        .groupBy("user_id")
        .agg(F.max("pc").alias("pc"))
        .agg(F.sum("pc").alias("t"))
        .collect()[0]
        .t
    )
    assert total_micro == touched * 1_000_000, (total_micro, touched)


def test_kcore_counts_monotone(spark):
    rows = {r.round: r.n_nodes for r in QUERIES["kcore_part_graph"](spark, SF).collect()}
    assert rows[1] >= rows[2] >= rows[3] >= 0
