"""Simulate the driver's correctness gate exactly, before the driver does.

Runs the FIRST 50 registered queries (the driver's CORRECTNESS window —
VERDICT r01 #1) in a PLAIN SparkSession (none of get_spark's confs, like the
harness) at sf0.01, compares each against its DuckDB oracle with the
driver's discipline (row count + column names + order-insensitive values),
and prints failures.  Run at round start after testdata regeneration and
before shipping window changes:

    python tools/driver_sim.py              # first 50 (the driver window)
    python tools/driver_sim.py --all        # every oracle-checked query
    python tools/driver_sim.py name1 name2  # specific queries
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
# the driver gate runs at sf0.01; override to pre-flight stateful queries at
# other scales too (VERDICT r04 ask#6: sf0.01 AND sf0.1 before windowing)
SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _canon_scalar(v):
    """Collapse container/library wrappers but KEEP the numeric type tag:
    int stays int, float stays float — the driver hashes type-tagged exact
    values, so 3 (Spark BIGINT) must NOT equal 3.0 (DuckDB HUGEINT→float64).
    That exact looseness let the r02 window pass pre-flight while the driver
    failed `iqr_outlier_report` (VERDICT r02 #2)."""
    if type(v).__module__ == "numpy":
        # np.ndarray (DuckDB fetchdf returns LIST columns as arrays) must be
        # compared element-wise — .item() raises ValueError for size > 1
        # (ADVICE r03). Only 0-d / true scalars get .item().
        if getattr(v, "ndim", 0):
            return tuple(_canon_scalar(x) for x in v.tolist())
        if hasattr(v, "item"):
            v = v.item()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_scalar(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_scalar(x)) for k, x in v.items()))
    return v


def values_equal(a, b) -> bool:
    a, b = _canon_scalar(a), _canon_scalar(b)
    if a is None and b is None:
        return True
    if isinstance(a, float) != isinstance(b, float):
        return False  # int-vs-float type mismatch fails, exactly like the driver hash
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — no tolerance; the driver hashes exact doubles
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--all":
        names = [n for n in qs if n in oracles]
    elif args:
        names = args
    else:
        names = list(qs)[:50]

    bad = []
    for n in names:
        if n not in oracles:
            print(f"  (skip {n}: rows-only, no oracle)")
            continue
        try:
            sdf = canon(qs[n](spark, SF).toPandas())
            ddf = canon(con.execute(oracles[n]).fetchdf())
            ok = len(sdf) == len(ddf) and list(sdf.columns) == list(ddf.columns)
            if ok:
                for c in sdf.columns:
                    for x, y in zip(sdf[c].tolist(), ddf[c].tolist()):
                        if not values_equal(x, y):
                            ok = False
                            break
                    if not ok:
                        break
            if not ok:
                bad.append((n, f"shape/value mismatch: spark={len(sdf)} duck={len(ddf)}"))
        except Exception as ex:  # noqa: BLE001 - report, don't abort
            bad.append((n, f"{type(ex).__name__}: {ex}"[:160]))
    print(f"checked {len(names)} queries, failures: {len(bad)}")
    for n, why in bad:
        print(f"  FAIL {n}: {why}")
    print("entry() rows:", entry_mod.entry(spark).count())
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
