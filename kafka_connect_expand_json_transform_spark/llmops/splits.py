"""Deterministic dataset splitting and sampling — [EXT] training-data
pipeline operators (SURVEY.md §2.2 north-star mandate; no reference analogue
— the reference transforms records one at a time, ExpandJson.java:86-92, and
has no notion of a dataset).

Everything is a *narrow* transformation: split/sample membership is a pure
function of ``md5(id || ':' || seed)``, so there is no shuffle, no RNG state,
and the assignment is reproducible across runs, engines, and cluster sizes —
the property that matters when the same 100 TB corpus must be split
identically by every job that reads it.  ``df.randomSplit``/``df.sample``
give none of that (partition-order-dependent RNG).

Hash discipline: the first 8 hex chars of md5 are a uniform draw from
[0, 16^8).  A fraction ``f`` becomes the fixed-width hex threshold
``format(int(f * 16**8), '08x')`` and membership is a plain string
comparison — bit-identical in Spark and in the DuckDB oracle (md5 agrees
byte-for-byte; fixed-width hex compares lexicographically == numerically).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 16**8  # first 8 hex chars of md5


def split_hash(id_col: Column | str, seed: str) -> Column:
    """Uniform [0, 16^8) draw as an 8-char hex string, keyed by id and seed."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(c.cast("string"), F.lit(f":{seed}"))), 1, 8)


def hex_threshold(fraction: float) -> str:
    """Fixed-width hex threshold for a fraction; 'g' is the +inf sentinel
    (sorts after every hex digit, so ``hash < 'g'`` admits everything)."""
    if fraction >= 1.0:
        return "g"
    return format(max(int(fraction * _HASH_SPACE), 0), "08x")


def hash_split(
    df: DataFrame,
    weights: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    id_col: str = "doc_id",
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    Unlike ``randomSplit`` the assignment is a pure function of the id: a doc
    lands in the same split no matter how the data is partitioned, how many
    executors run, or which job asks.  Weights are normalized to sum to 1.
    """
    total = sum(w for _, w in weights)
    if total <= 0:
        raise ValueError("split weights must sum to a positive number")
    h = split_hash(id_col, seed)
    expr = None
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w / total
        cond = h < F.lit(hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last_name = weights[-1][0]
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep each row iff its hash falls
    under its stratum's threshold.  A narrow filter — no shuffle, unlike
    ``sampleBy`` no RNG, and the kept set is stable under repartitioning."""
    h = split_hash(id_col, seed)
    expr: Column | None = None
    for value, frac in fractions.items():
        cond = h < F.lit(hex_threshold(frac))
        expr = (
            F.when(F.col(strata_col) == value, cond)
            if expr is None
            else expr.when(F.col(strata_col) == value, cond)
        )
    default = h < F.lit(hex_threshold(default_fraction))
    expr = default if expr is None else expr.otherwise(default)
    return df.where(expr)


def domain_mix(
    df: DataFrame,
    domain_col: str,
    target_shares: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Downsample domains to hit a target mixture (the "data recipe" step of
    a pretraining pipeline).

    Finds the largest total N such that every listed domain can supply its
    share without upsampling (``N = min_d(count_d / share_d)``), then keeps
    each domain's rows with rate ``share_d * N / count_d`` via the
    deterministic hash filter.  Domains not listed are dropped.

    The per-domain counts are a dimension-sized aggregate (#domains rows) —
    collected to the driver to build the filter thresholds; at 100 TB this is
    one map-side-combined agg over the corpus, not a data shuffle.
    """
    shares = {k: v for k, v in target_shares.items() if v > 0}
    total_share = sum(shares.values())
    if total_share <= 0:
        raise ValueError("target_shares must contain positive weights")
    shares = {k: v / total_share for k, v in shares.items()}

    counts = {
        r[0]: r[1]
        for r in df.where(F.col(domain_col).isin(*shares))
        .groupBy(domain_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = [d for d in shares if counts.get(d, 0) == 0]
    if missing:
        raise ValueError(f"domains absent from data: {sorted(missing)}")
    scale = min(counts[d] / shares[d] for d in shares)
    rates = {d: min(1.0, shares[d] * scale / counts[d]) for d in shares}
    return stratified_sample(
        df.where(F.col(domain_col).isin(*rates)),
        domain_col,
        rates,
        id_col=id_col,
        seed=seed,
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: str = "cap",
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by deterministic hash order
    (capping any one domain/source's contribution to a corpus).  Unlike
    ``ORDER BY rand() LIMIT n`` the kept set is reproducible and
    partition-invariant; ties in the 8-hex hash break on the id."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(split_hash(id_col, seed), id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: Column | str,
    id_col: str = "doc_id",
    seed: str = "wsample",
) -> DataFrame:
    """Keep each row with probability = its own weight in [0, 1] —
    quality-weighted downsampling (keep good documents more often), but
    deterministic: membership is ``hash_draw(id, seed) < weight``, a pure
    row-local function, so the same corpus samples identically on any
    cluster, any partitioning, any engine.

    The comparison stays in the fixed-width-hex domain of ``split_hash``:
    the per-row threshold is ``lpad(hex(floor(w * 16^8)), 8, '0')`` (with
    the 'g' sentinel for w >= 1), so an 8-char lexicographic compare equals
    the numeric compare and DuckDB reproduces it byte-for-byte via
    ``to_hex``."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    thr = F.when(w >= 1.0, F.lit("g")).otherwise(
        F.lpad(F.lower(F.hex(F.floor(w * F.lit(float(_HASH_SPACE))).cast("bigint"))), 8, "0")
    )
    return df.where(split_hash(id_col, seed) < thr)


def upsample_repeat(
    df: DataFrame,
    factor: float,
    id_col: str = "doc_id",
    seed: str = "upsample",
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic fractional upsampling — the data-recipe epoch knob
    (`domain_mix` downsamples; recipes also say "repeat the math domain
    2.25x"): every row appears ``floor(factor)`` times and one further time
    with probability ``frac(factor)``, decided by the usual row-local
    ``md5(id:seed)`` draw, so the SAME copies materialize on any cluster,
    partitioning, or engine.  Narrow: ``explode(sequence)`` fan-out plus a
    pure-function filter — no shuffle, no RNG state; the ``copy`` ordinal
    rides along so downstream shuffles can decorrelate repeats."""
    import math

    if factor <= 0:
        raise ValueError(f"factor must be positive, got {factor}")
    whole = int(math.floor(factor))
    frac = factor - whole
    fanout = whole + (1 if frac > 0 else 0)
    out = df.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(fanout))).alias(copy_col)
    )
    if frac > 0:
        out = out.where(
            (F.col(copy_col) <= whole)
            | (split_hash(id_col, seed) < F.lit(hex_threshold(frac)))
        )
    return out
