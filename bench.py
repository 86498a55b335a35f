"""Benchmark harness: run the declared query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line with per-query seconds.

Each query is materialized through the noop sink so the full plan executes
(a bare count() would let Catalyst prune computed columns away). Timings are
wall-clock per query, after a warmup action that absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])  # optional: bench a subset by name

    from kafka_connect_expand_json_transform_spark import get_spark
    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES

    spark = get_spark(app_name="kafka-connect-expand-json-transform-spark-bench")

    # warmup: absorb JVM + codegen + parquet footer reads across the tables
    # the suite touches (keeps per-query numbers about the query, not startup)
    from kafka_connect_expand_json_transform_spark.sources.batch import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).limit(1000).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 - report, don't abort the suite
            failures[name] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "declared_query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1),
        "n_queries": len(timings),
    }
    if failures:
        result["failures"] = failures
    print(json.dumps(result))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
