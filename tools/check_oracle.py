"""Local differential harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, comparing row count, column names,
and an order-insensitive value hash (columns sorted by name, rows
sorted, floats rounded). Usage:

    python tools/check_oracle.py [--vanilla] [sf_dir] [query_name ...]

``--vanilla`` runs the Spark side on a bare SparkSession (UTC timezone
only — no AQE/Arrow/shuffle tuning from session.get_spark), mimicking
the DRIVER's environment; catches any query that silently depends on
our own session configuration.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if abs(v) < 1e15 else f"{v:.6e}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = list(row)
        out.append("|".join(canon_value(vals[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as mod

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from chicago_business_owners_data_engineering_spark.session import get_spark

        spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures, passes, rows_only = [], [], []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns differ: spark={sorted(scols)} duckdb={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"row count differs: spark={len(srows)} duckdb={len(drows)}")
        if not problems:
            sc = canon_rows(srows, scols)
            dc = canon_rows(drows, dcols)
            if sc != dc:
                diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passes.append(name)
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passes)} ok, {len(rows_only)} rows-only, {len(failures)} failed"
        f" of {len([n for n in qs if not only or n in only])}"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
