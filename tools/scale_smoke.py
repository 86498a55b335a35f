"""sf1 scale smoke (VERDICT r03 ask#8): execute the heaviest dedup/graph/
similarity queries at ~10x the bench scale and record wall times, so the
100x design claims are exercised above sf0.1 at least once per round —
memory cliffs (shingle arrays, CC iteration growth, LSH bucket skew) show
up here long before they would on a cluster.

The driver ships no sf1 fixtures, so this tool REPLICATES sf0.1 tenfold
into $SPARK_GRAFT_SMOKE_DIR (default /tmp/sf1_smoke): copy i offsets every
key by i*10_000_000 and perturbs text/embeddings slightly (a per-copy token
suffix / epsilon) so near-dup structure scales realistically instead of
every doc gaining 9 exact twins.  This is PERF input only — correctness
stays oracle-checked at sf0.01; nothing here feeds CORRECTNESS_r{N}.

    python tools/scale_smoke.py            # generate (if absent) + run
    python tools/scale_smoke.py --regen    # force regeneration
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/tmp/sf1_smoke")
COPIES = int(os.environ.get("SPARK_GRAFT_SMOKE_COPIES", "10"))
OFF = 10_000_000

HEAVY = [
    "minhash_dedup_md5",
    "curation_pipeline_md5",
    "incremental_dedup_report",
    "dup_span_coverage",
    "prefix_filter_jaccard_pairs",
    "containment_pairs",
    "semantic_blocked_pairs",
    "triangle_count_part_graph",
    "label_prop_communities",
    "pagerank_event_graph",
    "semantic_dedup_survivors",  # round-4: blocked pairs + CC + keep-one
    "txlog_merge_upsert",  # round-4 late: full-outer merge + CoW rewrite
    "ccnet_perplexity_buckets",  # round-4 late: word explode + NTILE window
    "txlog_change_feed_agg",  # round-4 late: capture-backed CDF over CoW DML
    "stream_txlog_merge_e2e",  # round-4 late: 3 micro-batch ACID merges
    "stream_incremental_dedup_e2e",  # round-5: per-batch artifact dedup loop
    "txlog_bloom_point_lookups",  # round-5: per-file blooms, 78-needle batch
    "txlog_clone_branch_agg",  # round-5: zero-copy branch + CoW divergence
    "incremental_agg_maintenance",  # round-5: CDF-delta aggregate refresh
    "connect_smt_chain_pipeline",  # round-5: 8-SMT codegen chain
]

# (table, [key columns to offset per copy])
TABLES = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from kafka_connect_expand_json_transform_spark.sources import load_table

    os.makedirs(DST, exist_ok=True)
    for table, keys in TABLES.items():
        src = load_table(spark, SRC, table)
        if not keys:  # tiny dims: copy once, no replication needed
            out = src
        else:
            parts = []
            for i in range(COPIES):
                c = src
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * OFF))
                if table == "documents" and i > 0:
                    # distinct per-copy suffix: shingles shift, so copies are
                    # NEAR dups of copy 0, not exact twins (realistic scaling)
                    c = c.withColumn(
                        "text", F.concat(F.col("text"), F.lit(f" copyt{i}"))
                    )
                if table == "embeddings" and i > 0:
                    eps = float(i) * 1e-4
                    c = c.withColumn(
                        "embedding",
                        F.transform("embedding", lambda x: x + F.lit(eps)),
                    )
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
        out.write.mode("overwrite").parquet(os.path.join(DST, f"{table}.parquet"))
        print(f"generated {table}", flush=True)


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    if "--regen" in sys.argv or not os.path.isdir(
        os.path.join(DST, "documents.parquet")
    ):
        t0 = time.monotonic()
        generate(spark)
        print(f"generation: {time.monotonic() - t0:.1f}s", flush=True)

    qs = entry_mod.queries()

    # pseudo-query: the SCALE-SAFE auto-k blocking path (k=None derives
    # k ∝ n).  The registered semantic_blocked_pairs query pins k=8 for
    # oracle determinism — at 10-100x data that fixed k IS the measured
    # quadratic cliff, so the smoke must probe the default/auto path too.
    def _semantic_blocked_autok(spark, sf_dir):
        from kafka_connect_expand_json_transform_spark.llmops import similarity
        from kafka_connect_expand_json_transform_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        return similarity.cluster_blocked_pairs(emb, threshold=0.4, iters=3)

    qs = dict(qs, semantic_blocked_autok=_semantic_blocked_autok)
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or HEAVY
    timings, failures = {}, {}
    for name in names:
        t0 = time.monotonic()
        try:
            n = qs[name](spark, DST).count()
            timings[name] = {"sec": round(time.monotonic() - t0, 1), "rows": n}
            print(f"{name}: {timings[name]['sec']}s, {n} rows", flush=True)
        except Exception as exc:  # noqa: BLE001 — smoke must report, not die
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{name}: FAILED {failures[name]}", flush=True)
    print(json.dumps({"sf": "~1 (10x sf0.1)", "timings": timings, "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
