#!/usr/bin/env python
"""sf0.1 → sf1 scaling-ratio harness (round-8, VERDICT r7 item 3).

The 100 TB story is argued from plan shape; this measures it at the
largest scale the container supports: a derived 10× dataset (sf1
equivalent) built by replicating sf0.1's FACT tables ten times with
disjoint key ranges (dimensions stay fixed — fact growth dominates
real scale-ups, and the jaffle PK/FK tests still hold: shifted
o_orderkey/l_orderkey keep order/line PKs unique, untouched custkeys
keep FKs valid). Dates are unchanged, so month-partition counts stay
constant and partitions grow 10× — exactly the shape a year of 10×
traffic has.

For every jaffle_* mart query and the full pipeline_build, this times
median-of-N noop-write runs at BOTH scales and prints per-query
seconds + the sf1/sf0.1 ratio. Linear-or-better (ratio ≲ 10× on a
fixed-core box; usually much less, since Spark amortizes fixed plan/
scheduling overheads) is the pass bar recorded in BASELINE.md.

Derivation happens ONCE into $SPARK_GRAFT_SCALE_DIR (default
/tmp/sfscale10) and is reused; /root/testdata stays untouched
(read-only). Dimension/auxiliary tables are symlinked, not copied.

Usage: python scripts/scale_ratio.py [--runs N] [--factor K]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

FACTS = {
    # table -> columns whose values must shift per replica to keep PKs
    # unique and PK-composed FKs consistent (orders.o_orderkey ↔
    # lineitem.l_orderkey shift together)
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
}
# key space per replica: far above any sf0.1 key, far below int64/2
REPLICA_STRIDE = 10**12


def build_derived(spark, src: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(dst, "_DERIVED_OK")):
        return
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if not name.endswith(".parquet"):
            continue
        table = name[: -len(".parquet")]
        out = os.path.join(dst, name)
        if os.path.lexists(out):
            if os.path.isdir(out):
                shutil.rmtree(out)
            else:
                os.remove(out)
        if table not in FACTS:
            os.symlink(os.path.join(src, name), out)
            continue
        df = spark.read.parquet(os.path.join(src, name))
        shifted = None
        for k in range(factor):
            rep = df
            for col in FACTS[table]:
                rep = rep.withColumn(col, F.col(col) + F.lit(k * REPLICA_STRIDE))
            shifted = rep if shifted is None else shifted.unionByName(rep)
        # size write partitions for ~128 MB files at the target scale
        shifted.repartition(32).write.mode("overwrite").parquet(out)
    open(os.path.join(dst, "_DERIVED_OK"), "w").write("ok\n")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median_time(fn, runs: int) -> float:
    from dbt_jaffleshop_spark.models.base import release_cached

    fn()  # warm-up (un-timed): JIT/codegen/footer caches
    release_cached()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        release_cached()
    return statistics.median(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    dst = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sfscale10")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbt_jaffleshop_spark.plans.dag import run_pipeline
    from dbt_jaffleshop_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("scale-ratio")
    build_derived(spark, args.base, dst, args.factor)

    queries = entrymod.queries()
    marts = [n for n in queries if n.startswith("jaffle_") and not n.endswith("_digest")]

    results: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in (("sf0.1", args.base), (f"sf{args.factor}x", dst)):
        for name in marts:
            sec = _median_time(lambda: _force(queries[name](spark, sf_dir)), args.runs)
            results.setdefault(name, {})[sf_label] = round(sec, 2)
            print(f"{sf_label:8s} {name:35s} {sec:7.2f}s", flush=True)

        def _build_once():
            wh = tempfile.mkdtemp(prefix="scale_wh_")
            try:
                res = run_pipeline(spark, sf_dir, warehouse_dir=wh)
                bad = {k: v for k, v in res.items() if v.get("status") not in ("ok",)}
                assert not bad, f"pipeline failures at {sf_label}: {bad}"
            finally:
                shutil.rmtree(wh, ignore_errors=True)

        sec = _median_time(_build_once, args.runs)
        results.setdefault("pipeline_build", {})[sf_label] = round(sec, 2)
        print(f"{sf_label:8s} {'pipeline_build':35s} {sec:7.2f}s", flush=True)

    big = f"sf{args.factor}x"
    for name, r in results.items():
        r["ratio"] = round(r[big] / max(r["sf0.1"], 1e-9), 2)
    print(json.dumps({"metric": "scale_ratio", "factor": args.factor,
                      "results": results}, separators=(",", ":")))


if __name__ == "__main__":
    main()
