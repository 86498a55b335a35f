"""Declarative data-quality expectations — [EXT] the dbt-tests /
Great-Expectations-shaped contract layer over DataFrames: declare a suite
of named expectations per table, evaluate EVERY in-table expectation in a
single aggregation pass, and get a long-form violations report suitable
for gating a pipeline run.

Design (the one-pass property is the point at 100 TB):

* In-table expectations (``not_null``, ``unique``-by-approx?, no —
  ``accepted_range``, ``accepted_values``, ``regex_match``, custom SQL
  predicate) compile to ``SUM(CASE WHEN violated THEN 1)`` columns of ONE
  aggregate — the table is scanned once no matter how many expectations
  it carries.
* ``unique`` needs a grouped distinct count and ``foreign_key`` needs an
  anti-join against another table — each adds its own (reduced) job; both
  still shuffle keys, never payloads.

Related single-purpose reports already in the suite:
``profiling.constraint_report`` (per-column null/range census),
``pk_uniqueness_report``, ``fk_orphans_report``.  This module is the
composable front door over the same machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    """One named check. ``kind`` selects the compiler:

    - ``not_null``        column must not be NULL
    - ``accepted_range``  params: min/max (inclusive; either optional)
    - ``accepted_values`` params: values (list)
    - ``regex_match``     params: pattern (violation = no match)
    - ``predicate``       params: sql (violation = NOT(sql))
    - ``unique``          column (or params["columns"]) must be unique
    - ``foreign_key``     params: ref (DataFrame), ref_column
    """

    name: str
    kind: str
    column: str | None = None
    params: dict = field(default_factory=dict)


def _violation_expr(e: Expectation) -> Column:
    c = F.col(e.column) if e.column else None
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "accepted_range":
        cond = F.lit(False)
        if "min" in e.params:
            cond = cond | (c < F.lit(e.params["min"]))
        if "max" in e.params:
            cond = cond | (c > F.lit(e.params["max"]))
        return c.isNotNull() & cond
    if e.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(*e.params["values"])
    if e.kind == "regex_match":
        return c.isNotNull() & ~c.rlike(e.params["pattern"])
    if e.kind == "predicate":
        return ~F.expr(e.params["sql"])
    raise ValueError(f"not an in-scan expectation: {e.kind}")


def evaluate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate a suite against one table; returns the long-form report
    (expectation STRING, n_rows BIGINT, n_violations BIGINT, passed BIGINT).

    All in-scan expectations share ONE aggregation over ONE scan; each
    ``unique`` adds one key-count job and each ``foreign_key`` one reduced
    anti-join job.
    """
    in_scan = [e for e in expectations if e.kind not in ("unique", "foreign_key")]
    aggs = [F.count("*").alias("__n")]
    for e in in_scan:
        aggs.append(
            F.sum(F.when(_violation_expr(e), 1).otherwise(0)).alias(e.name)
        )
    base = df.agg(*aggs)

    reports = []
    if in_scan:
        # ONE aggregate row exploded to long form — a union of per-check
        # selects over `base` would duplicate the whole aggregate (and its
        # scan) once per branch in the logical plan
        stacked = base.select(
            F.col("__n"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(e.name).alias("expectation"),
                            F.col(e.name).alias("v"),
                        )
                        for e in in_scan
                    ]
                )
            ).alias("s"),
        ).select(
            F.col("s.expectation").alias("expectation"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col("s.v").cast("bigint").alias("n_violations"),
            F.when(F.col("s.v") == 0, 1).otherwise(0).cast("bigint").alias(
                "passed"
            ),
        )
        reports.append(stacked)
    for e in expectations:
        if e.kind == "unique":
            cols = e.params.get("columns", [e.column])
            g = df.groupBy(*cols).count()
            rep = g.agg(
                F.sum("count").alias("__n"),
                F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0))
                .alias("__v"),
            ).select(
                F.lit(e.name).alias("expectation"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col("__v").cast("bigint").alias("n_violations"),
                F.when(F.col("__v") == 0, 1).otherwise(0).cast("bigint").alias(
                    "passed"
                ),
            )
            reports.append(rep)
        elif e.kind == "foreign_key":
            ref = e.params["ref"].select(
                F.col(e.params["ref_column"]).alias(e.column)
            ).distinct()
            keys = df.select(e.column)
            # dbt / Great-Expectations convention: NULL keys are NOT
            # orphans (relationship tests pass them; `not_null` owns
            # nullability).  Opt back in with params["count_nulls"]=True.
            if not e.params.get("count_nulls", False):
                keys = keys.where(F.col(e.column).isNotNull())
            orphans = keys.join(ref, e.column, "left_anti")
            total = df.count()
            rep = orphans.agg(F.count("*").alias("__v")).select(
                F.lit(e.name).alias("expectation"),
                F.lit(total).cast("bigint").alias("n_rows"),
                F.col("__v").cast("bigint").alias("n_violations"),
                F.when(F.col("__v") == 0, 1).otherwise(0).cast("bigint").alias(
                    "passed"
                ),
            )
            reports.append(rep)
    if not reports:
        # empty suite: empty report with the documented schema, not IndexError
        return df.sparkSession.createDataFrame(
            [],
            "expectation STRING, n_rows BIGINT, n_violations BIGINT, passed BIGINT",
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out
