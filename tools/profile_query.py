"""Per-query profiling harness for the optimization rounds (guide §1).

Times individual declared queries through the same noop-sink methodology as
bench.py (construction + full materialization), in ONE get_spark session with
the same warmup, and optionally dumps .explain("formatted") per query.

    python tools/profile_query.py q1_pricing_summary simhash_candidates
    python tools/profile_query.py --reps 3 curation_pipeline_md5
    python tools/profile_query.py --explain plans/r10 --suffix before q3_ship

The explain file is written as plans/<dir>/<name>_<suffix>.txt — the judge
checks plan claims against these files.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from kafka_connect_expand_json_transform_spark import get_spark
    from kafka_connect_expand_json_transform_spark.plans.queries import QUERIES
    from kafka_connect_expand_json_transform_spark.sources.batch import load_table

    spark = get_spark(app_name="sg-profile")
    # bench.py's warmup, abbreviated: JVM + python worker + noop sink
    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, args.sf_dir, t).limit(1000).write.format("noop").mode("overwrite").save()
    ev = load_table(spark, args.sf_dir, "events").limit(64)
    ev.mapInPandas(lambda it: it, ev.schema).write.format("noop").mode("overwrite").save()

    for name in args.names:
        if name not in QUERIES:
            print(f"!! unknown query {name}")
            continue
        fn = QUERIES[name]
        times = []
        jobs = []
        for rep in range(args.reps):
            group = f"prof_{name}_{rep}"
            spark.sparkContext.setJobGroup(group, f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t_build = time.perf_counter() - t0
            if args.explain and rep == 0:
                # dump BEFORE the final action (VERDICT r10 #4): a post-
                # execution dump of a localCheckpoint'ed result collapses
                # every optimized stage into ExistingRDD and proves nothing.
                # (Stages the query fn itself already executed — fixture
                # writes, eager checkpoints — are inherently not visible at
                # this level; those claims are evidenced by job counts.)
                os.makedirs(args.explain, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(dt)
            n_jobs = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(group)
            )
            jobs.append(n_jobs)
            spark.sparkContext.setJobGroup(None, None)
            print(
                f"{name} rep{rep}: {dt:.3f}s (construction {t_build:.3f}s, "
                f"{n_jobs} jobs)",
                flush=True,
            )
            spark.catalog.clearCache()
        print(
            f"== {name}: min {min(times):.3f}s over {len(times)} reps, "
            f"jobs {jobs}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
