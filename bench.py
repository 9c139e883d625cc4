#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The headline set covers the full jaffle DAG (the reference's `dbt build`
analogue) plus the heaviest beyond-reference operators, so the number
tracks end-to-end pipeline throughput, not a cherry-picked fast query.
Each query is forced with `.count()` (executes the whole plan; no
driver-side collect of the result rows).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from dbt_jaffleshop_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    queries = entrymod.queries()

    # Headline set: every terminal jaffle mart (covers the whole DAG since
    # marts recompute their upstreams) + the flagship extension operators.
    headline = [
        "jaffle_order_items",
        "jaffle_orders",
        "jaffle_customers",
        "jaffle_products",
        "jaffle_supplies",
        "jaffle_locations",
        "jaffle_customer_segmentation",
        "jaffle_time_analytics",
    ]
    extras = [
        "dedup_exact",
        "dedup_minhash_pairs",
        "dedup_simhash",
        "text_quality",
        "sim_topk_cosine",
        "sim_ivf_topk",
        "events_sessionize",
        "events_asof_join",
    ]
    names = [n for n in headline + extras if n in queries]

    timings: dict[str, float] = {}

    # the flagship workload: the full `dbt build` analogue — materialize
    # all 16 models (staging views cached, marts written as tables) and
    # run every declared data test (SURVEY §3.1/§5).
    import tempfile

    from dbt_jaffleshop_spark.plans.dag import run_pipeline

    with tempfile.TemporaryDirectory() as wh:
        t0 = time.perf_counter()
        res = run_pipeline(spark, sf_dir, warehouse_dir=wh)
        timings["pipeline_build"] = round(time.perf_counter() - t0, 3)
    bad = [k for k, v in res.items() if v["status"] != "ok"]
    if bad:
        print(f"pipeline failures: {bad}", file=sys.stderr)

    # fresh session for the per-query timings: isolates them from the
    # pipeline run's cached state / GC pressure
    spark.stop()
    spark = get_spark("bench-queries")

    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
