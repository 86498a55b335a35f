"""Relational operators beyond stock DataFrame calls.

All ``[EXT]`` per SURVEY.md §2.2 — the reference contains no relational
operators (SURVEY.md §2.1: "Explicitly absent ... all join types, all
aggregations"). Everything here composes built-in Spark operators so Catalyst
keeps optimizing through them; no UDFs, no RDDs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the matching right row per key —
    ``backward`` (latest right with rt <= lt, the default/pandas semantics),
    ``forward`` (earliest right with rt >= lt), or ``nearest`` (smaller
    absolute gap, ties to backward). Equal times match in every direction.

    Spark has no as-of primitive (SURVEY.md §2.2), so this uses the
    union + ordered-window fill trick:

        L(key, t, payload, NULLs) UNION R(key, t, NULLs, payload)
        -> last(right cols, ignorenulls) over (key order t)   [backward]
           first(right cols, ignorenulls) over reverse frame  [forward]
        -> keep left rows

    Cost model: exactly ONE shuffle on the key (the window's partitionBy) —
    the same exchange a sort-merge join would need, with no join explosion
    and no per-key driver loop, so it scales to 100 TB the way a SMJ does
    (``nearest`` adds one extra in-partition sort, still one shuffle).
    Skewed keys are split by AQE.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    lpayload = [c for c in left.columns if c not in keys and c != left_time]
    rpayload = [c for c in right.columns if c not in keys and c != rt]

    rp_names = {c: (c + suffix if c in left.columns else c) for c in rpayload}
    rtime_out = rt + suffix if rt in left.columns or rt == left_time else rt
    rcols = [*rp_names.values(), rtime_out]

    # the right row travels as ONE struct so the fill can never stitch
    # columns from different right rows (a per-column ignorenulls fill would
    # skip genuine NULLs in the matched row and pull stale values forward)
    rstruct = F.struct(
        *[F.col(c).alias(rp_names[c]) for c in rpayload],
        F.col(rt).alias(rtime_out),
    )
    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lpayload],
        F.lit(None).cast(right.select(rstruct).schema[0].dataType).alias("__r"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(rt).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpayload],
        rstruct.alias("__r"),
    )
    filled = lhs.unionByName(rhs)

    tol = None if tolerance_seconds is None else F.lit(float(tolerance_seconds))
    t_sec = F.col("__t").cast("double")

    if direction in ("backward", "nearest"):
        # right rows sort before left rows at equal time, so an equal-time
        # right row is visible looking backward (inclusive semantics)
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = filled.withColumn("__rb", F.last(F.col("__r"), ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        # left rows sort before right rows at equal time -> equal-time right
        # row is inside the forward frame
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t"), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = filled.withColumn("__rf", F.first(F.col("__r"), ignorenulls=True).over(wf))

    out = filled.where(F.col("__is_left") == 1)

    def chosen_struct() -> Column:
        b_lag = t_sec - F.col("__rb")[rtime_out].cast("double")
        f_lag = F.col("__rf")[rtime_out].cast("double") - t_sec
        if direction == "backward":
            valid = F.lit(True) if tol is None else b_lag <= tol
            return F.when(valid, F.col("__rb"))
        if direction == "forward":
            valid = F.lit(True) if tol is None else f_lag <= tol
            return F.when(valid, F.col("__rf"))
        b_ok = b_lag.isNotNull() if tol is None else (b_lag <= tol)
        f_ok = f_lag.isNotNull() if tol is None else (f_lag <= tol)
        use_b = (F.coalesce(b_ok, F.lit(False))) & (
            ~F.coalesce(f_ok, F.lit(False)) | (b_lag <= f_lag)
        )
        return F.when(use_b, F.col("__rb")).otherwise(
            F.when(F.coalesce(f_ok, F.lit(False)), F.col("__rf"))
        )

    picked = chosen_struct()
    return out.select(
        *keys,
        F.col("__t").alias(left_time),
        *lpayload,
        *[picked[c].alias(c) for c in rcols],
    )


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number — map-side partial top-k is done
    by Spark's WindowGroupLimit pushdown (rank<=k filters push into the
    sort), so only ~k rows per group per partition reach the shuffle."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side once per bucket,
    so a hot key's rows spread over ``salt_buckets`` tasks instead of one.

    AQE's skew-join split (on by default in ``get_spark``) handles most skew
    at runtime; reach for explicit salting when a single key exceeds what one
    task can hold even after AQE splitting, or on Spark builds/paths where
    AQE can't rewrite (e.g. some stream-static joins).

    Cost: right side × salt_buckets rows through the shuffle — size
    ``salt_buckets`` to the skew factor, not higher. Supported ``how``:
    inner/left (right-preserving joins would need right-side salting).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    salted_l = left.withColumn(
        salt_col, (F.abs(F.hash(*[F.col(k) for k in keys], F.monotonically_increasing_id())) % salt_buckets)
    )
    salted_r = right.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_l.join(salted_r, [*keys, salt_col], how)
    return out.drop(salt_col)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_seconds`` (island labeling
    via lag + running sum). One shuffle on the key."""
    w = Window.partitionBy(key).orderBy(ts)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: str | list[str],
    order_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """CDC merge: apply a changelog to a snapshot (MERGE INTO semantics).

    ``changes`` rows carry the snapshot's data columns plus ``op_col``
    ('I'/'U'/``delete_op``) and a monotonically-ordered ``order_col``
    (commit timestamp / LSN).  Per key only the LATEST change wins
    (row_number over (key, order desc)); a delete removes the key, anything
    else upserts the row.

    Scale shape: one shuffle of the (small) changelog for the window, one
    key-partitioned anti-join of the snapshot against the touched keys — the
    snapshot is never windowed.  With a dimension-sized changelog, AQE turns
    the anti-join broadcast.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = snapshot.join(latest.select(*keys), keys, "left_anti")
    upserts = latest.where(F.col(op_col) != delete_op).drop(op_col, order_col)
    return untouched.unionByName(upserts)


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | list[str],
    compare_cols: list[str] | None = None,
    status_col: str = "diff_status",
) -> DataFrame:
    """Snapshot diff: classify every key as added / removed / changed /
    unchanged between two versions of a table (the data-ops audit step
    before publishing a refreshed dataset).

    One full-outer equi-join on the keys; the compared columns are packed
    into a single struct per side so the change test is one null-safe
    struct comparison (codegen) rather than N per-column ORs.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    compare = compare_cols or [c for c in old.columns if c not in keys]
    missing = [c for c in compare if c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from new side: {missing}")
    o = old.select(*keys, F.struct(*compare).alias("__old"))
    n = new.select(*keys, F.struct(*compare).alias("__new"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__old").isNull(), "added")
        .when(F.col("__new").isNull(), "removed")
        .when(~F.col("__old").eqNullSafe(F.col("__new")), "changed")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias(status_col), "__old", "__new")


def binned_range_join(
    intervals: DataFrame,
    points: DataFrame,
    interval_start: str,
    interval_end: str,
    point_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Pure interval-containment join (no equi key): match every ``points``
    row whose ``point_col`` lies in ``[interval_start, interval_end)``.

    Spark plans a bare range predicate as BroadcastNestedLoopJoin — O(n*m)
    comparisons and a mandatory broadcast of one whole side, which is the
    canonical 100 TB cliff.  This operator converts it to an EQUI join by
    discretizing the domain into fixed-width bins: each interval is exploded
    to the bins it overlaps (``sequence(floor(s/w), floor(e/w))``), each
    point hashes to exactly one bin, the bin id carries a shuffled hash /
    sort-merge join, and the exact range predicate is re-applied to the
    candidates.  Each (interval, point) pair meets in exactly one bin — the
    point's own — so no dedup is needed.

    Cost model: |intervals| * (len/width + 1) exploded rows, then one
    hash-partitioned equi join on the bin id.  Pick ``bin_width`` near the
    typical interval length so the explosion factor stays ~2 and every bin's
    candidate list stays small; skewed bins (hot time ranges) are split by
    AQE like any skewed equi key.

    All three columns must be numeric in the same unit (cast timestamps with
    ``unix_timestamp``/``cast("long")`` first).  ``[EXT]`` — SURVEY.md §2.2
    lists range joins; the reference has no joins at all (SURVEY.md §2.1).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"binned_range_join supports inner/left, got {how!r}")
    w = F.lit(float(bin_width))
    s, e, p = F.col(interval_start), F.col(interval_end), F.col(point_col)
    lo = F.floor(s.cast("double") / w).cast("long")
    hi = F.floor(e.cast("double") / w).cast("long")
    binned = intervals.withColumn("__bin", F.explode(F.sequence(lo, hi)))
    pts = points.withColumn("__bin", F.floor(p.cast("double") / w).cast("long"))
    matched = binned.join(pts, on="__bin", how="inner").where(
        (p >= s) & (p < e)
    ).drop("__bin")
    if how == "inner":
        return matched
    # left: keep intervals with no point (null-padded), like a LEFT range join
    point_side = [c for c in points.columns]
    hit_keys = matched.select(*intervals.columns).dropDuplicates()
    missed = intervals.join(hit_keys, on=intervals.columns, how="left_anti")
    for c in point_side:
        missed = missed.withColumn(c, F.lit(None).cast(points.schema[c].dataType))
    return matched.unionByName(missed)


def dataset_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-insensitive content checksum: one row of ``(n, checksum)`` where
    checksum = SUM of a 32-bit slice of each row's md5 — identical under any
    partitioning/ordering (integer addition commutes), so two engines or two
    runs can compare a 100 TB table by exchanging 16 bytes. The audit
    companion to ``dataset_diff`` (which says WHAT changed; this says
    WHETHER, for free).

    Non-string columns are cast to string: keep key/string columns here —
    float-to-string rendering is engine-specific, hash floats yourself
    first. NULL folds to a sentinel, and columns join on a US separator so
    ('ab','c') and ('a','bc') hash differently.
    """
    use = cols or df.columns
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\u2400")) for c in use]
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws("\u001f", *parts)), 1, 8), 16, 10
    ).cast("long")
    return df.agg(
        F.count("*").alias("n"), F.sum(row_hash).cast("long").alias("checksum")
    )


def aggregate_partials(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate raw rows into mergeable partials per `measures` spec:
    ``out_name -> (fn, src_col)`` with fn in sum|count|min|max (the
    distributive aggregates — exactly the ones incremental view maintenance
    can refresh without history)."""
    aggs = []
    for out, (fn, src) in measures.items():
        if fn == "sum":
            aggs.append(F.sum(src).alias(out))
        elif fn == "count":
            aggs.append(F.count(src).alias(out))
        elif fn == "min":
            aggs.append(F.min(src).alias(out))
        elif fn == "max":
            aggs.append(F.max(src).alias(out))
        else:
            raise ValueError(f"non-distributive aggregate {fn!r}; "
                             "IVM supports sum/count/min/max (avg = sum/count)")
    return df.groupBy(*keys).agg(*aggs)


def refresh_aggregate(
    base_agg: DataFrame,
    delta_raw: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: merge a
    previously materialized ``aggregate_partials`` result with newly arrived
    raw rows WITHOUT rescanning base history. The delta is aggregated with
    the same spec, then partials re-reduce (sum+sum, count+sum, min+min,
    max+max). Cost is O(|delta| + |groups|) — the refresh shuffles partial
    rows, never base raws; at 100 TB this is the difference between a
    nightly full recompute and a minutes-long delta merge. Equivalence
    ``refresh(partials(base), delta) == partials(base ∪ delta)`` is the
    oracle-checked contract (`incremental_agg_orders`)."""
    delta_agg = aggregate_partials(delta_raw, keys, measures)
    remerge = []
    for out, (fn, _) in measures.items():
        if fn in ("sum", "count"):
            remerge.append(F.sum(out).alias(out))
        elif fn == "min":
            remerge.append(F.min(out).alias(out))
        else:
            remerge.append(F.max(out).alias(out))
    return base_agg.unionByName(delta_agg).groupBy(*keys).agg(*remerge)


def delta_join_refresh(
    mv: DataFrame,
    left_old: DataFrame,
    left_delta: DataFrame,
    right_old: DataFrame,
    right_delta: DataFrame,
    on,
    select_cols: list[str],
) -> DataFrame:
    """Incremental view maintenance for an inner JOIN view (the bilinear
    delta rule): given the materialized view ``mv = L_old |><| R_old`` and
    insert-only deltas, the refreshed view is

        mv  U  (dL |><| R_old)  U  (L_old |><| dR)  U  (dL |><| dR)

    The four terms partition the new pair space exactly (each output pair's
    membership is determined by which side of the old/delta split its two
    inputs fall on), so the result equals the from-scratch join — without
    ever re-joining L_old with R_old.  Deltas are BROADCAST (small by
    definition), so a refresh costs one scan of each base side probed by a
    broadcast hash join plus one delta-delta join — at 100 TB, O(new data)
    instead of the O(table-shuffle) recompute.  Complements
    :func:`refresh_aggregate` (the aggregate half of IVM).  Deletes/updates
    need signed multiplicities (the CDF consumer in
    ``incremental_agg_maintenance`` shows that shape); this operator is the
    insert-only fast path every streaming ingest hits."""
    # broadcast the RIGHT (dimension) side of every term: left is the fact
    # table by convention, and "small delta" is a workload property, not a
    # plan guarantee — a reprocessing day where dL is 30% of the facts must
    # not force a fact-side broadcast.  dR and R_old are dimension-sized;
    # AQE still upgrades a genuinely tiny dL on its own.
    t1 = left_delta.join(F.broadcast(right_old), on).select(*select_cols)
    t2 = left_old.join(F.broadcast(right_delta), on).select(*select_cols)
    t3 = left_delta.join(F.broadcast(right_delta), on).select(*select_cols)
    return mv.unionByName(t1).unionByName(t2).unionByName(t3)


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_by: list[str] | None = None,
) -> DataFrame:
    """2D Pareto frontier (skyline): keep rows not dominated by any other row
    in their group, where p dominates q iff ``p.x >= q.x and p.y <= q.y``
    with at least one strict (maximize x, minimize y — negate a column to
    flip its direction).

    Not the O(n²) dominance self-join: aggregate to one row per distinct x
    (per-x min of y — this table is |distinct x|, typically orders of
    magnitude smaller than the input), take the suffix-min of y over
    strictly-greater x with one window pass, and join the two thresholds
    back. A row survives iff no better-x row has y <= its y, and no same-x
    row has y < its y. Two shuffles (distinct-x agg + join, which AQE
    broadcasts when distinct-x fits); the full data is never sorted.
    """
    g = list(group_by or [])
    x, y = F.col(x_col), F.col(y_col)
    perx = df.groupBy(*g, x_col).agg(F.min(y).alias("__ymin"))
    w = Window.partitionBy(*g).orderBy(F.col(x_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    thresholds = perx.withColumn("__sm", F.min("__ymin").over(w))
    joined = df.join(thresholds, on=g + [x_col], how="inner")
    not_dominated = (
        (F.col("__sm").isNull() | (F.col("__sm") > y)) & (F.col("__ymin") == y)
    )
    return joined.where(not_dominated).drop("__ymin", "__sm")


def _global_order_index(
    df: DataFrame, order_by: list, num_ranges: int | None
) -> DataFrame:
    """Shared phase-1/2 of the two-phase global-order family: range-shuffle
    on the ordering key, per-range counts prefix-summed to start offsets (a
    ``num_ranges``-row window, never the data), partitioned ``row_number``
    within ranges.  Adds ``__gidx`` (exact 1-based global index over the
    total order) and ``__n_total``; caller must drop both.

    ``num_ranges=None`` (the family default) derives the range count from
    the session's ``spark.sql.shuffle.partitions`` — the same scale-set knob
    every other shuffle in the plan uses — instead of a constant: the final
    index is provably identical under ANY boundary choice (offsets are
    computed from the realized per-range counts), so the range count is a
    pure parallelism decision and must scale with the data/cluster, not sit
    at a local constant."""
    if num_ranges is None:
        num_ranges = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    ranged = df.repartitionByRange(num_ranges, *order_by).withColumn(
        "__rng", F.spark_partition_id()
    )
    cnt = ranged.groupBy("__rng").agg(F.count("*").alias("__c"))
    w_off = Window.orderBy("__rng").rowsBetween(Window.unboundedPreceding, -1)
    off = cnt.select(
        "__rng",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__c").over(Window.partitionBy()).alias("__n_total"),
    )
    rn = F.row_number().over(Window.partitionBy("__rng").orderBy(*order_by))
    return (
        ranged.withColumn("__rn", rn)
        .join(F.broadcast(off), "__rng")
        .withColumn("__gidx", (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__rng", "__rn", "__off")
    )


def exact_row_number(
    df: DataFrame,
    order_by: list,
    out: str = "rn",
    num_ranges: int | None = None,
) -> DataFrame:
    """Exact global ``row_number`` over a TOTAL order without the
    single-partition window — the two-phase range-partitioned rank
    (see :func:`exact_ntile` for the decomposition).  Callers must order
    by a total order (unique tie-break key) for a deterministic result."""
    return (
        _global_order_index(df, order_by, num_ranges)
        .withColumn(out, F.col("__gidx"))
        .drop("__gidx", "__n_total")
    )


def exact_running_sum(
    df: DataFrame,
    order_by: list,
    value_col: str,
    out: str = "running_sum",
    num_ranges: int | None = None,
) -> DataFrame:
    """Exact global running sum (UNBOUNDED PRECEDING .. CURRENT ROW over a
    total order) without the single-partition window: per-range value
    totals prefix-sum to range offsets (``num_ranges`` rows), then a
    PARTITIONED cumulative sum inside each range adds its offset — the
    classic distributed prefix-sum.  The timeline-sweep decomposition for
    event-grain running state at 100 TB.  ``num_ranges=None`` derives the
    range count from the session's shuffle-partition setting (see
    ``_global_order_index``)."""
    if num_ranges is None:
        num_ranges = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    ranged = df.repartitionByRange(num_ranges, *order_by).withColumn(
        "__rng", F.spark_partition_id()
    )
    tot = ranged.groupBy("__rng").agg(F.sum(value_col).alias("__t"))
    w_off = Window.orderBy("__rng").rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select(
        "__rng", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__soff")
    )
    w_in = (
        Window.partitionBy("__rng")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("__cs", F.sum(value_col).over(w_in))
        .join(F.broadcast(off), "__rng")
        .withColumn(out, F.col("__soff") + F.col("__cs"))
        .drop("__rng", "__cs", "__soff")
    )


def exact_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: list,
    out: str = "bucket",
    num_ranges: int | None = None,
) -> DataFrame:
    """Exact NTILE over a TOTAL order without the single-partition window
    (``Window.orderBy`` with no partition moves every row to one task —
    the scale-killer ``WindowExec: No Partition Defined`` warns about).

    Two-phase range-partitioned rank, the distributed-sort decomposition:

      1. ``repartitionByRange`` on the ordering key splits the total order
         into ``num_ranges`` contiguous, disjoint ranges (sampled
         boundaries; any boundary choice yields the same final index).
      2. Per-range row counts (a ``num_ranges``-row aggregate) prefix-sum
         to the range's global start offset — the only unpartitioned
         window left runs over ``num_ranges`` rows, never the data.
      3. ``row_number`` PARTITIONED by range gives the within-range rank
         in parallel; global 1-based index = offset + local rank.
      4. The NTILE formula on the index: the first ``N % n`` buckets get
         ``ceil(N/n)`` rows, the rest ``floor(N/n)`` — bit-identical to
         ``F.ntile(n).over(Window.orderBy(...))`` when the ordering is a
         total order (callers here always carry a unique-key tie-break).

    ``order_by`` is a list of Columns (use ``F.col(c).desc()`` for
    descending).  Equal keys always land in one range (ranges are
    key-disjoint intervals), so tie behavior matches the global window's.
    At 100 TB: one range shuffle + one tiny agg — no single-task sort.
    """
    idx = _global_order_index(df, order_by, num_ranges)

    def _intdiv(a: Column, b: Column) -> Column:
        # positive-int floor division without a double intermediate
        return ((a - F.pmod(a, b)) / b).cast("bigint")

    i = F.col("__gidx")
    n = F.lit(n_buckets).cast("bigint")
    total = F.col("__n_total").cast("bigint")
    base = _intdiv(total, n)  # floor(N/n)
    rem = F.pmod(total, n)  # first `rem` buckets take base+1 rows
    big = base + 1
    bucket = F.when(
        i <= rem * big, _intdiv(i + big - 1, big)
    ).otherwise(rem + _intdiv(i - rem * big + base - 1, base))
    return idx.withColumn(out, bucket.cast("int")).drop("__gidx", "__n_total")


def heavy_hitters(
    df: DataFrame,
    col: str,
    phi: float,
    k: int | None = None,
) -> DataFrame:
    """Exact φ-heavy hitters (all values with frequency ≥ ``phi`` · N) via
    the two-phase Misra-Gries decomposition — the hot-key detector that
    never shuffles the raw data on the value column.

    Phase 1 runs a Misra-Gries summary with ``k`` counters INSIDE each
    partition (``mapInPandas`` — one pass, O(k) memory per task, no
    shuffle): any value with global frequency > N/(k+1) is guaranteed to
    survive in at least one partition's summary, so with the default
    ``k = ceil(2/phi)`` the union of partition summaries is a SUPERSET of
    every φ-heavy value.  Phase 2 exactly recounts ONLY the candidates
    (broadcast semi-join + one partial-aggregated groupBy over the
    candidate rows) and filters ``count >= ceil(phi * N)`` — output is
    EXACT, so a plain GROUP BY/HAVING oracle reproduces it bit-for-bit.

    At 100 TB: phase 1 is a narrow scan; phase 2 touches only rows whose
    value is a candidate (at most ~partitions·k distinct values).  The
    all-values groupBy this replaces is exactly the shuffle that dies on
    skew — here the skewed key IS the thing being looked for, and it never
    leaves its partition until it has been reduced to a count.
    """
    import math

    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    if k is None:
        k = max(1, math.ceil(2.0 / phi))

    def summarize(batches):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts(dropna=True).items():
                c = int(c)
                if v in counters:
                    counters[v] += c
                elif len(counters) < k:
                    counters[v] = c
                else:
                    # decrement-all by the min: batch form of MG's evict
                    dec = min(c, min(counters.values()))
                    counters = {
                        key: cnt - dec for key, cnt in counters.items() if cnt > dec
                    }
                    if c > dec and len(counters) < k:
                        counters[v] = c - dec
        if counters:
            yield pd.DataFrame({col: list(counters.keys())})

    cand_schema = df.select(col).schema
    candidates = (
        df.select(col).mapInPandas(summarize, cand_schema).distinct()
    )
    n_total = df.count()
    threshold = math.ceil(phi * n_total)
    recounted = (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= F.lit(threshold))
    )
    return recounted
