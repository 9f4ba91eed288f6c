"""Per-query perf probe for the optimization rounds (guide §1).

For each named query:
  - times DataFrame CONSTRUCTION (driver-side py4j plan building) and
    EXECUTION separately, N reps each;
  - execution is driven by the bench's own action (``.count()``) by
    default, or the noop sink (``--noop``) to force every column
    (guide §1.4);
  - optionally writes ``.explain("formatted")`` to a plans dir.

Usage:
    python tools/perf_probe.py q05_supplier_volume dd04_minhash_lsh_pairs \
        --reps 5 --plans plans/r10 --suffix _before.txt
    python tools/perf_probe.py --all-bench --reps 3 --json /tmp/probe.json

Emits one JSON line per query:
    {"query": ..., "construct_s": [...], "exec_s": [...], "median": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chicago_business_owners_data_engineering_spark import registry
from chicago_business_owners_data_engineering_spark.session import get_spark


def probe(
    spark,
    sf_dir: str,
    name: str,
    reps: int,
    use_noop: bool,
    plans_dir: str | None,
    suffix: str,
    clear_cache: bool,
) -> dict:
    fn = registry.QUERIES[name]
    construct, execute = [], []
    spark.sparkContext.setJobDescription(f"perf_probe:{name}")
    for _ in range(reps):
        if clear_cache:
            spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        t2 = time.time()
        construct.append(round(t1 - t0, 4))
        execute.append(round(t2 - t1, 4))
    spark.sparkContext.setJobDescription(None)
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}{suffix}"), "w") as f:
            f.write(plan)
    total = sorted(round(c + e, 4) for c, e in zip(construct, execute))
    return {
        "query": name,
        "construct_s": construct,
        "exec_s": execute,
        "median": total[len(total) // 2],
        "min": total[0],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    ap.add_argument("--plans", default=None, help="dir for explain(formatted) output")
    ap.add_argument("--suffix", default="_before.txt")
    ap.add_argument("--json", default=None, help="also append JSONL here")
    ap.add_argument("--clear-cache", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("perf_probe")
    # same warmup as bench.py
    registry.QUERIES["a01_dataset_summary"](spark, args.sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

    out = open(args.json, "a") if args.json else None
    for name in args.queries:
        row = probe(
            spark, args.sf_dir, name, args.reps, args.noop,
            args.plans, args.suffix, args.clear_cache,
        )
        line = json.dumps(row)
        print(line, flush=True)
        if out:
            out.write(line + "\n")
    if out:
        out.close()


if __name__ == "__main__":
    main()
