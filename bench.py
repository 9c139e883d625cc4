#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Emission format (round-4 fix — BENCH_r03.json recorded ``parsed: null``
because one giant final line outgrew the driver's tail capture):
auxiliary records (per-query minimums, per-query load-average telemetry)
are printed as their OWN earlier JSON lines, and the FINAL stdout line is
a compact machine-readable record — medians only, 2-decimal rounding —
{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} — small enough to always parse.

The headline set covers the full jaffle DAG (the reference's `dbt build`
analogue) plus the heaviest beyond-reference operators, so the number
tracks end-to-end pipeline throughput, not a cherry-picked fast query.

Measurement protocol (recorded in BASELINE.md):
* forcing — every query is materialized with a `noop`-format write, which
  executes the FULL plan. (`.count()` is wrong for this: Catalyst prunes
  all columns under a count aggregate, so projection-heavy plans skip
  their expensive expressions.)
* repetitions — one un-timed warm-up run, then median of 3 timed runs,
  per query and for the pipeline build (this VM shows 2-4× single-run
  noise; the median is the comparable number). Override the timed-run
  count with $SPARK_GRAFT_BENCH_RUNS.
* caches — operator-managed caches (models.base.cached memo) are released
  between timed runs, so each timed run pays its own cache population,
  matching how the driver invokes queries cold.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _force(df) -> None:
    """Execute the whole plan without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS") or 3))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from dbt_jaffleshop_spark.models.base import release_cached
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
        "dedup_embedding_lsh",
        "text_quality",
        "sim_topk_cosine",
        "sim_ivf_topk",
        "events_sessionize",
        "events_asof_join",
    ]
    names = [n for n in headline + extras if n in queries]
    # Round-over-round continuity (r2 protocol, unchanged): the headline
    # total sums pipeline_build + the 17-query set above. Every OTHER
    # registered query is ALSO timed under the identical protocol and
    # recorded in "queries", so regressions are measured row-for-row
    # rather than inferred — but kept out of the headline sum so `value`
    # stays comparable across rounds.
    rest = [n for n in queries if n not in names]

    timings: dict[str, float] = {}

    # the flagship workload: the full `dbt build` analogue — materialize
    # all 16 models (staging views cached, marts written as tables) and
    # run every declared data test (SURVEY §3.1/§5).
    import tempfile

    from dbt_jaffleshop_spark.plans.dag import run_pipeline

    # Medians are the headline statistic; per-query minimums are ALSO
    # recorded (own "queries_min" line) because this VM shows sustained
    # external contention windows (load >10 with zero local processes —
    # see BASELINE.md round-3 notes) that can cover all three timed runs
    # of a query: the min is the least-disturbed cold measurement.
    mins: dict[str, float] = {}
    # 1-min load average per query, sampled TWICE: before the warm-up
    # (clean external-contention reading, but can miss a window opening
    # during a long warm-up) and at the start of the timed runs (covers
    # the timed window, but includes the harness's own warm-up self-load).
    # Both are recorded so contention rows are machine-identifiable
    # without either bias (round-3 verdict item 5).
    loads: dict[str, float] = {}
    loads_pre: dict[str, float] = {}

    build_times: list[float] = []
    loads_pre["pipeline_build"] = round(os.getloadavg()[0], 1)
    for i in range(runs + 1):  # first run is the un-timed warm-up
        if i == 1:
            loads["pipeline_build"] = round(os.getloadavg()[0], 1)
        with tempfile.TemporaryDirectory() as wh:
            t0 = time.perf_counter()
            res = run_pipeline(spark, sf_dir, warehouse_dir=wh)
            dt = time.perf_counter() - t0
        if i > 0:
            build_times.append(dt)
        bad = [k for k, v in res.items() if v["status"] != "ok"]
        if bad:
            print(f"pipeline failures: {bad}", file=sys.stderr)
    timings["pipeline_build"] = round(statistics.median(build_times), 2)
    mins["pipeline_build"] = round(min(build_times), 2)

    # fresh session for the per-query timings: isolates them from the
    # pipeline run's cached state / GC pressure
    spark.stop()
    spark = get_spark("bench-queries")

    for name in names + rest:
        fn = queries[name]
        per_run: list[float] = []
        loads_pre[name] = round(os.getloadavg()[0], 1)
        for i in range(runs + 1):
            if i == 1:  # start of the timed runs, after warm-up
                loads[name] = round(os.getloadavg()[0], 1)
            release_cached(spark)  # each run pays its own cache population
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            if i > 0:
                per_run.append(time.perf_counter() - t0)
        release_cached(spark)
        timings[name] = round(statistics.median(per_run), 2)
        mins[name] = round(min(per_run), 2)

    total = round(
        timings["pipeline_build"] + sum(timings[n] for n in names), 2
    )
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # Auxiliary records first, each on its own line — the driver captures
    # the tail of stdout and parses the LAST JSON line, which must stay
    # compact (see module docstring).
    print(json.dumps({"metric": "queries_min", "queries_min": mins}))
    print(
        json.dumps(
            {
                "metric": "load_avg_1m",
                "load_avg_timed_start": loads,
                "load_avg_pre_warmup": loads_pre,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "protocol": f"noop-write; warmup+median of {runs}",
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
