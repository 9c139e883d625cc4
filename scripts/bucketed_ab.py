"""A/B: bucketed vs month-partitioned materialization of the fact marts.

VERDICT r8 item 4. The recurring join in the jaffle pipeline is
``order_items ⋈ orders`` on ``order_id`` — it runs inside ``products``
(location analysis) and ``customer_segmentation`` (product preferences)
on every build. `functions/bucketing.py` can pay that shuffle once at
write time; this script measures whether adopting bucketed
materialization for the two fact marts actually wins for THIS pipeline,
at sf0.1, under two regimes:

* **default** — production configs (AQE + broadcast enabled). At mart
  scale the `orders` projection fits under the broadcast threshold, so
  Catalyst already plans broadcast joins on BOTH layouts and bucketing
  can only add overhead. This regime answers "adopt today?".
* **no-broadcast** — `autoBroadcastJoinThreshold=-1` (plan + AQE): the
  proxy for the 100 TB fact-fact regime where NEITHER side fits in an
  executor. Here the month-partitioned layout must shuffle both sides
  into a sort-merge join every run, while the bucketed layout reads
  both sides pre-hashed on order_id with zero Exchange. This regime
  answers "is the library path the right 100 TB answer?".

Method: build the two mart frames once, write each in both layouts
(layout A = today's month-partitioned parquet, mirroring
run_pipeline's partition_expr; layout B = write_bucketed on order_id,
16 buckets), then run the REAL downstream builders (`products`,
`customer_segmentation`) with the layout's frames injected through
``materialization_context`` — the builders themselves are byte-identical
across layouts. Alternating runs (A,B,A,B,…) so ambient drift hits both
sides equally; medians reported; row counts cross-checked between
layouts every run. Exchange counts in the formatted plan of the
canonical ``items ⋈ orders → groupBy`` join are printed as the
mechanism proof.

Usage::

    python scripts/bucketed_ab.py [--sf-dir /root/testdata/sf0.1]
                                  [--runs 3] [--cpus 32]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

MONTH_EXPR = "cast(date_trunc('month', ordered_at) as date)"


def _session(cpus: int, warehouse: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bucketed_ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def _write_partitioned(df, path: str):
    """Today's layout: month-partitioned parquet (run_pipeline's
    partition_expr), partition column dropped on re-read — exactly what
    downstream builders see after a pipeline run."""
    out = df.withColumn("order_month", F.expr(MONTH_EXPR))
    out.write.mode("overwrite").partitionBy("order_month").parquet(path)
    return df.sparkSession.read.parquet(path).drop("order_month")


def _write_bucketed(df, table: str, path: str):
    from dbt_jaffleshop_spark.functions.bucketing import write_bucketed

    write_bucketed(df, table, "order_id", num_buckets=16, path=path)
    return df.sparkSession.table(table)


def _workload(spark, sf_dir, tables) -> tuple[float, tuple[int, int]]:
    """Build the two order_id-join consumers against injected inputs."""
    from dbt_jaffleshop_spark.models import marts_analytics, marts_segmentation
    from dbt_jaffleshop_spark.models.base import materialization_context

    t0 = time.perf_counter()
    with materialization_context(dict(tables)):
        c1 = marts_analytics.products(spark, sf_dir).count()
        c2 = marts_segmentation.customer_segmentation(spark, sf_dir).count()
    return time.perf_counter() - t0, (c1, c2)


def _exchange_count(spark, tables) -> int:
    """Exchanges in the canonical recurring join's physical plan:
    items ⋈ orders on order_id → per-(product, location) agg (the
    products.sql location-analysis shape)."""
    items, orders = tables["order_items"], tables["orders"]
    plan_df = (
        items.select("order_id", "product_id", "product_price_cents")
        .join(orders.select("order_id", "location_id"), "order_id", "left")
        .groupBy("product_id", "location_id")
        .agg(F.sum("product_price_cents").alias("rev"))
    )
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="bucketed_ab_")
    spark = _session(args.cpus, os.path.join(tmp, "warehouse"))
    try:
        from dbt_jaffleshop_spark.models import marts_core

        items = marts_core.order_items(spark, args.sf_dir)
        orders = marts_core.orders(spark, args.sf_dir)

        layout_a = {
            "order_items": _write_partitioned(
                items, os.path.join(tmp, "a_order_items")),
            "orders": _write_partitioned(
                orders, os.path.join(tmp, "a_orders")),
        }
        layout_b = {
            "order_items": _write_bucketed(
                items, "ab_order_items_bkt", os.path.join(tmp, "b_order_items")),
            "orders": _write_bucketed(
                orders, "ab_orders_bkt", os.path.join(tmp, "b_orders")),
        }

        results: dict[str, dict] = {}
        for regime, bcast in (("default", None), ("no_broadcast", "-1")):
            if bcast is not None:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
                spark.conf.set(
                    "spark.sql.adaptive.autoBroadcastJoinThreshold", bcast)
            times: dict[str, list[float]] = {"partitioned": [], "bucketed": []}
            for i in range(args.runs):
                # alternate which layout goes first so warm-up/JIT cost
                # doesn't systematically land on one side
                if i % 2 == 0:
                    ta, ca = _workload(spark, args.sf_dir, layout_a)
                    tb, cb = _workload(spark, args.sf_dir, layout_b)
                else:
                    tb, cb = _workload(spark, args.sf_dir, layout_b)
                    ta, ca = _workload(spark, args.sf_dir, layout_a)
                if ca != cb:
                    raise SystemExit(
                        f"row-count mismatch between layouts: {ca} vs {cb}")
                times["partitioned"].append(ta)
                times["bucketed"].append(tb)
            results[regime] = {
                "partitioned_median_s": round(
                    statistics.median(times["partitioned"]), 2),
                "bucketed_median_s": round(
                    statistics.median(times["bucketed"]), 2),
                "partitioned_runs": [round(t, 2) for t in times["partitioned"]],
                "bucketed_runs": [round(t, 2) for t in times["bucketed"]],
                "exchanges_partitioned": _exchange_count(spark, layout_a),
                "exchanges_bucketed": _exchange_count(spark, layout_b),
                "rows": ca,
            }
        print(json.dumps({"sf_dir": args.sf_dir, "runs": args.runs,
                          "results": results}, indent=2))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
