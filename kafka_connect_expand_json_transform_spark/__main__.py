"""CLI: run declared queries against a testdata scale directory.

    python -m kafka_connect_expand_json_transform_spark --list
    python -m kafka_connect_expand_json_transform_spark q1_pricing_summary
    python -m kafka_connect_expand_json_transform_spark q3_shipping_priority --explain
    python -m kafka_connect_expand_json_transform_spark expand_props_agg --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kafka_connect_expand_json_transform_spark")
    p.add_argument("query", nargs="?", help="query name from the declared inventory")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--list", action="store_true", help="list available queries")
    p.add_argument("--explain", action="store_true", help="print the formatted plan")
    p.add_argument("--rows", type=int, default=20, help="rows to show")
    args = p.parse_args(argv)

    from kafka_connect_expand_json_transform_spark.plans.queries import ORACLES, QUERIES

    if args.list or not args.query:
        for name in QUERIES:
            print(f"{name}{'' if name in ORACLES else '  [rows-only]'}")
        return 0
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; --list shows the inventory", file=sys.stderr)
        return 2

    from kafka_connect_expand_json_transform_spark import get_spark

    spark = get_spark(app_name=f"query:{args.query}")
    try:
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.rows, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
