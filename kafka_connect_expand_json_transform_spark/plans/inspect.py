"""Plan inspection helpers — the scale contract, readable.

``plan_report`` condenses ``explain("formatted")`` into the handful of facts
that decide whether a plan survives a 100x scale-up: did the filters reach
the scan, how many columns does the scan actually read, which join
strategies were chosen, how many exchanges (shuffles) the plan pays, and
whether a cartesian product sneaked in.  Used by tests/test_plans.py-style
assertions and for interactive tuning.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def plan_report(df: DataFrame) -> dict:
    """Summarize the optimized physical plan (pre-execution; AQE may still
    improve join strategies at runtime, never worsen the static facts here).

    Keys: ``pushed_filters`` (per scan), ``read_schemas`` (per scan),
    ``joins`` (strategy counts), ``n_exchanges``, ``has_cartesian``,
    ``n_codegen_stages``.
    """
    text = _formatted(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", text)
    joins: dict[str, int] = {}
    for strat in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        n = text.count(strat)
        if n:
            joins[strat] = n
    return {
        "pushed_filters": [p for p in pushed if p],
        "read_schemas": schemas,
        "joins": joins,
        "n_exchanges": text.count("Exchange"),
        "has_cartesian": "CartesianProduct" in text,
        "n_codegen_stages": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text))),
    }


def assert_scale_safe(df: DataFrame, max_exchanges: int | None = None) -> dict:
    """Raise if the plan contains a cartesian product (the one shape that is
    never acceptable at scale) or exceeds an exchange budget; returns the
    report so callers can assert further facts."""
    rep = plan_report(df)
    if rep["has_cartesian"]:
        raise AssertionError("plan contains CartesianProduct")
    if max_exchanges is not None and rep["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan pays {rep['n_exchanges']} exchanges (budget {max_exchanges})"
        )
    return rep
