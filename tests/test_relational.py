"""Unit tests for operators.relational — the only relational ops the engine
implements itself (everything else is stock Spark; SURVEY.md §2.2)."""

import datetime

import pytest
from pyspark.sql import functions as F

from kafka_connect_expand_json_transform_spark.operators.relational import (
    asof_join,
    sessionize,
    top_k_per_group,
)


def ts(minute):
    return datetime.datetime(2026, 1, 1, 10, minute, 0)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [("A", ts(0), 100.0), ("A", ts(10), 101.0), ("B", ts(5), 50.0)],
        "sym string, t timestamp, px double",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts(0), 99.5),   # equal-time with first trade
            ("A", ts(7), 100.5),
            ("A", ts(12), 101.5),
            ("B", ts(9), 49.5),   # after B's only trade
        ],
        "sym string, t timestamp, bid double",
    )


def rows(df):
    return {
        (r["sym"], r["t"].minute): (r["bid"], r["t_right"].minute if r["t_right"] else None)
        for r in df.collect()
    }


def test_asof_backward(spark, trades, quotes):
    got = rows(asof_join(trades, quotes, on="sym", left_time="t"))
    assert got == {
        ("A", 0): (99.5, 0),     # equal time matches
        ("A", 10): (100.5, 7),   # latest quote <= 10:10
        ("B", 5): (None, None),  # no quote before 10:05
    }


def test_asof_forward(spark, trades, quotes):
    got = rows(asof_join(trades, quotes, on="sym", left_time="t", direction="forward"))
    assert got == {
        ("A", 0): (99.5, 0),     # equal time matches forward too
        ("A", 10): (101.5, 12),  # earliest quote >= 10:10
        ("B", 5): (49.5, 9),
    }


def test_asof_nearest_ties_backward(spark, trades, quotes):
    got = rows(asof_join(trades, quotes, on="sym", left_time="t", direction="nearest"))
    assert got == {
        ("A", 0): (99.5, 0),
        ("A", 10): (101.5, 12),  # forward gap 2min < backward gap 3min
        ("B", 5): (49.5, 9),     # only a forward match exists
    }


def test_asof_tolerance(spark, trades, quotes):
    got = rows(
        asof_join(trades, quotes, on="sym", left_time="t", tolerance_seconds=120)
    )
    # backward within 2 minutes only: the 10:07 quote is 3min before 10:10
    assert got[("A", 10)] == (None, None)
    assert got[("A", 0)] == (99.5, 0)


def test_asof_nearest_tolerance(spark, trades, quotes):
    got = rows(
        asof_join(
            trades, quotes, on="sym", left_time="t",
            direction="nearest", tolerance_seconds=150,
        )
    )
    # backward 3min excluded, forward 2min within tolerance
    assert got[("A", 10)] == (101.5, 12)


def test_asof_preserves_nulls_in_matched_row(spark):
    """A genuine NULL in the matched right row must come through as NULL —
    never be back-filled from an older right row (pandas merge_asof
    semantics; guards against per-column ignorenulls fills)."""
    from kafka_connect_expand_json_transform_spark.operators.relational import asof_join

    left = spark.createDataFrame([("k", ts(30))], "sym string, t timestamp")
    right = spark.createDataFrame(
        [("k", ts(0), 10.0), ("k", ts(20), None)], "sym string, t timestamp, bid double"
    )
    r = asof_join(left, right, on="sym", left_time="t").first()
    assert r["t_right"].minute == 20  # matched the latest row...
    assert r["bid"] is None  # ...including its NULL

    # with tolerance: validity judged on the matched row's time, and the
    # out-of-tolerance match yields NULL, not the older in-tolerance row
    r2 = asof_join(
        left, right, on="sym", left_time="t", tolerance_seconds=300
    ).first()
    assert r2["bid"] is None and r2["t_right"] is None


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 5), ("g1", 3), ("g2", 9)], "g string, v int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r["g"], r["v"], r["rn"]) for r in out.collect())
    assert got == [("g1", 3, 2), ("g1", 5, 1), ("g2", 9, 1)]


def test_salted_join_matches_plain_join(spark):
    from kafka_connect_expand_json_transform_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 0)], "k string, v int"
    )
    right = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, tag string")
    plain = {(r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["v"], r["tag"]) for r in salted_join(left, right, "k", salt_buckets=4).collect()}
    assert salted == plain
    # left join preserves unmatched left rows
    left2 = left.union(spark.createDataFrame([("orphan", 1)], "k string, v int"))
    lp = {(r["k"], r["v"], r["tag"]) for r in left2.join(right, "k", "left").collect()}
    ls = {(r["k"], r["v"], r["tag"]) for r in salted_join(left2, right, "k", how="left", salt_buckets=4).collect()}
    assert ls == lp


def test_sessionize(spark):
    df = spark.createDataFrame(
        [("u", ts(0)), ("u", ts(5)), ("u", ts(40)), ("v", ts(1))],
        "user string, t timestamp",
    )
    out = sessionize(df, "user", "t", gap_seconds=1800)
    got = {(r["user"], r["t"].minute): r["session_id"] for r in out.collect()}
    assert got == {("u", 0): 1, ("u", 5): 1, ("u", 40): 2, ("v", 1): 1}


def test_profiling_edge_cases(spark):
    from kafka_connect_expand_json_transform_spark.operators.profiling import (
        key_skew_report,
        summarize_numeric,
    )

    df = spark.createDataFrame([("en", 1.0), ("en", 3.0), ("de", 5.0)], "lang string, v double")
    # plain-string group_by treated as one column, not splatted into chars
    out = summarize_numeric(df, "v", group_by="lang")
    assert {r["lang"]: r["n"] for r in out.collect()} == {"en": 2, "de": 1}
    with pytest.raises(ValueError, match="collide"):
        key_skew_report(df.withColumnRenamed("lang", "key_count"), "key_count")


def test_packing_string_ids_and_null_text(spark):
    from kafka_connect_expand_json_transform_spark.llmops.packing import sequence_pack

    df = spark.createDataFrame(
        [("uuid-a", "one two three"), ("uuid-b", None), ("uuid-c", "four five")],
        "doc_id string, text string",
    )
    packed = sequence_pack(df, token_budget=4, num_buckets=4)
    rows = {r["doc_id"]: (r["bucket"], r["n_tokens"]) for r in packed.collect()}
    assert len(rows) == 3
    assert rows["uuid-b"][1] == 0  # null text counts as zero tokens
    assert all(0 <= b < 4 for b, _ in rows.values())


def test_binned_range_join_matches_naive(spark):
    from kafka_connect_expand_json_transform_spark.operators.relational import binned_range_join

    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 40.0, 55.0), (4, 90.0, 91.0)],
        "iid int, s double, e double",
    )
    points = spark.createDataFrame(
        [(100, 0.0), (101, 5.5), (102, 9.999), (103, 10.0), (104, 54.0), (105, 70.0)],
        "pid int, p double",
    )
    naive = {
        (r["iid"], r["pid"])
        for r in intervals.crossJoin(points)
        .where((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
        .collect()
    }
    for width in (1.0, 7.0, 100.0):  # narrower, comparable, wider than intervals
        got = binned_range_join(intervals, points, "s", "e", "p", width)
        pairs = [(r["iid"], r["pid"]) for r in got.collect()]
        assert len(pairs) == len(set(pairs)), "pair matched in more than one bin"
        assert set(pairs) == naive, width


def test_binned_range_join_left_pads_empty_intervals(spark):
    from kafka_connect_expand_json_transform_spark.operators.relational import binned_range_join

    intervals = spark.createDataFrame([(1, 0.0, 10.0), (4, 90.0, 91.0)], "iid int, s double, e double")
    points = spark.createDataFrame([(100, 3.0)], "pid int, p double")
    got = binned_range_join(intervals, points, "s", "e", "p", 10.0, how="left")
    by_iid = {r["iid"]: r["pid"] for r in got.collect()}
    assert by_iid == {1: 100, 4: None}
    with pytest.raises(ValueError, match="bin_width"):
        binned_range_join(intervals, points, "s", "e", "p", 0)


def test_refresh_aggregate_equals_full_recompute(spark):
    from kafka_connect_expand_json_transform_spark.operators.relational import (
        aggregate_partials,
        refresh_aggregate,
    )
    from pyspark.sql import functions as F

    rows = [(i % 3, "g" + str(i % 2), float(i), i) for i in range(40)]
    df = spark.createDataFrame(rows, "k int, g string, v double, w long")
    measures = {
        "n": ("count", "w"),
        "s": ("sum", "w"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    base, delta = df.where("w < 25"), df.where("w >= 25")
    merged = refresh_aggregate(
        aggregate_partials(base, ["k", "g"], measures), delta, ["k", "g"], measures
    )
    full = aggregate_partials(df, ["k", "g"], measures)
    key = lambda r: (r.k, r.g)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # delta containing brand-new groups must appear too
    extra = spark.createDataFrame([(9, "new", 1.5, 100)], "k int, g string, v double, w long")
    merged2 = refresh_aggregate(full, extra, ["k", "g"], measures)
    assert merged2.where("k = 9").count() == 1


def test_aggregate_partials_rejects_non_distributive(spark):
    import pytest as _pytest

    from kafka_connect_expand_json_transform_spark.operators.relational import (
        aggregate_partials,
    )

    df = spark.range(3)
    with _pytest.raises(ValueError, match="non-distributive"):
        aggregate_partials(df, [], {"a": ("avg", "id")})


def test_fk_orphan_report_counts_orphans_and_nulls(spark):
    import pytest
    from kafka_connect_expand_json_transform_spark.operators.profiling import (
        fk_orphan_report,
    )

    parent = spark.createDataFrame([(1,), (2,), (2,)], "pk long")  # dup keys OK
    child = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 9), (4, None), (5, 1)], "id long, fk long"
    )
    rows = {
        r["relation"]: r
        for r in fk_orphan_report([("c->p", child, "fk", parent, "pk")]).collect()
    }
    r = rows["c->p"]
    assert (r["child_rows"], r["null_fks"], r["orphans"]) == (5, 1, 1)
    with pytest.raises(ValueError, match="no relations"):
        fk_orphan_report([])


def test_interval_coverage_merges_touching_and_overlapping(spark):
    from kafka_connect_expand_json_transform_spark.operators.timeseries import (
        interval_coverage,
    )

    rows = [
        ("u1", 0, 10), ("u1", 5, 12),   # overlap -> [0,12)
        ("u1", 12, 15),                  # touching merges (half-open)
        ("u1", 20, 25),                  # gap -> new island
        ("u2", 3, 4), ("u2", 3, 4),      # duplicate rows collapse
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = sorted(
        (r.k, r.island_start, r.island_end)
        for r in interval_coverage(df, "k", "s", "e").collect()
    )
    assert out == [("u1", 0, 15), ("u1", 20, 25), ("u2", 3, 4)]


def test_skyline_2d_dominance_semantics(spark):
    from kafka_connect_expand_json_transform_spark.operators.relational import (
        skyline_2d,
    )

    pts = [(5, 3), (4, 1), (4, 2), (3, 0), (5, 3), (2, 5)]
    df = spark.createDataFrame([("g", x, y) for x, y in pts], "g string, x long, y long")
    out = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y", ["g"]).collect())
    # (4,2) dominated by (4,1); (2,5) by (3,0); duplicate (5,3) both survive
    assert out == [(3, 0), (4, 1), (5, 3), (5, 3)]
    # groups are independent: same points in another group unaffected
    df2 = df.union(spark.createDataFrame([("h", 9, 9)], "g string, x long, y long"))
    assert skyline_2d(df2, "x", "y", ["g"]).where("g = 'h'").count() == 1


def test_skyline_matches_bruteforce_on_random_inputs(spark):
    """Seeded random sweep vs the O(n²) dominance definition — tie-heavy
    small coordinate ranges exercise the same-x / duplicate edge cases."""
    import random

    from kafka_connect_expand_json_transform_spark.operators.relational import (
        skyline_2d,
    )

    for seed in range(5):
        rng = random.Random(seed)
        pts = [
            (rng.choice("gh"), rng.randrange(8), rng.randrange(8))
            for _ in range(40)
        ]
        expected = sorted(
            p
            for p in pts
            if not any(
                q[0] == p[0]
                and q[1] >= p[1]
                and q[2] <= p[2]
                and (q[1] > p[1] or q[2] < p[2])
                for q in pts
            )
        )
        df = spark.createDataFrame(pts, "g string, x long, y long")
        got = sorted((r.g, r.x, r.y) for r in skyline_2d(df, "x", "y", ["g"]).collect())
        assert got == expected, (seed, got, expected)


def test_aes_roundtrip_lossless_and_ciphertext_differs(spark):
    """aes_roundtrip_report's security property, asserted where Catalyst
    can't prune it: GCM ciphertext never equals (or embeds) the plaintext,
    two encryptions of the same value differ (random IV), and decrypt
    recovers the plaintext exactly."""
    from pyspark.sql import functions as F

    key = F.lit("0123456789abcdef")
    df = spark.createDataFrame(
        [("Customer#000000001",), ("Customer#000000002",)], "name string"
    )
    enc = df.select(
        "name", F.aes_encrypt(F.col("name").cast("binary"), key).alias("ct")
    )
    rows = enc.collect()
    for r in rows:
        assert bytes(r["ct"]) != r["name"].encode()
        assert r["name"].encode() not in bytes(r["ct"])
    # per-EXECUTION random IV: a second run of the same plan yields
    # different ciphertexts (identical expressions within one plan are
    # CSE'd by Catalyst, so the comparison must span executions)
    rows2 = enc.collect()
    assert [bytes(r["ct"]) for r in rows] != [bytes(r["ct"]) for r in rows2]
    back = enc.select(
        "name", F.aes_decrypt("ct", key).cast("string").alias("dec")
    )
    assert all(r["name"] == r["dec"] for r in back.collect())


def test_exact_ntile_matches_global_window(spark):
    """exact_ntile (range-partitioned two-phase rank) is bit-identical to
    F.ntile over the single-partition global window for any total order —
    ties, descending keys, and N < n_buckets included."""
    from pyspark.sql import Window

    from kafka_connect_expand_json_transform_spark.operators.relational import (
        exact_ntile,
    )

    rows = [(i, (i * 37) % 11, f"k{i:04d}") for i in range(500)]
    df = spark.createDataFrame(rows, "id int, v int, k string")  # heavy ties on v
    for n, order in [
        (7, [F.col("v"), F.col("k")]),
        (10, [F.col("v").desc(), F.col("k")]),
        (3, [F.col("k").desc()]),
    ]:
        got = exact_ntile(df, n, order, out="b", num_ranges=8)
        exp = df.withColumn("b", F.ntile(n).over(Window.orderBy(*order)))
        assert (
            got.select("id", "b").exceptAll(exp.select("id", "b")).count() == 0
            and exp.select("id", "b").exceptAll(got.select("id", "b")).count() == 0
        ), (n, order)
    # N < n_buckets: each row its own bucket, numbered 1..N
    tiny = spark.createDataFrame([(3,), (1,), (2,)], "x int")
    got = {r["x"]: r["b"] for r in exact_ntile(tiny, 10, [F.col("x")], out="b").collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_heavy_hitters_exact_vs_naive(spark):
    """Two-phase Misra-Gries == naive groupBy/HAVING exactly, across
    partitionings (the per-partition summary is a candidate superset; the
    recount makes the output exact regardless of arrival order)."""
    from kafka_connect_expand_json_transform_spark.operators.relational import (
        heavy_hitters,
    )

    # 3 heavy keys (~10% each) over a 500-key tail, adversarial interleave
    rows = []
    for i in range(3000):
        if i % 10 < 3:
            rows.append((f"hot_{i % 10}",))
        else:
            rows.append((f"tail_{i % 500}",))
    df = spark.createDataFrame(rows, "key string")
    for frame in (df.repartition(32), df.coalesce(1), df.repartition(7, "key")):
        got = {(r["key"], r["cnt"]) for r in heavy_hitters(frame, "key", 0.05).collect()}
        exp = {
            (r["key"], r["cnt"])
            for r in df.groupBy("key")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") >= 150)  # ceil(0.05 * 3000)
            .collect()
        }
        assert got == exp and len(exp) == 3
    # phi validation
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "key", 0.0)


def test_exact_row_number_and_running_sum_match_global_window(spark):
    """exact_row_number / exact_running_sum (two-phase range-partitioned
    forms) match the single-partition global window bit-for-bit."""
    from pyspark.sql import Window

    from kafka_connect_expand_json_transform_spark.operators.relational import (
        exact_row_number,
        exact_running_sum,
    )

    rows = [((i * 17) % 23, i, (i % 7) - 3) for i in range(400)]
    df = spark.createDataFrame(rows, "v int, id int, delta int")
    order = [F.col("v"), F.col("id")]
    got_rn = exact_row_number(df.repartition(16), order, out="rn")
    exp_rn = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert (
        got_rn.select("id", "rn").exceptAll(exp_rn.select("id", "rn")).count() == 0
        and exp_rn.select("id", "rn").exceptAll(got_rn.select("id", "rn")).count() == 0
    )
    got_cs = exact_running_sum(df.repartition(16), order, "delta", out="cs")
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    exp_cs = df.withColumn("cs", F.sum("delta").over(w))
    assert (
        got_cs.select("id", "cs").exceptAll(exp_cs.select("id", "cs")).count() == 0
        and exp_cs.select("id", "cs").exceptAll(got_cs.select("id", "cs")).count() == 0
    )
