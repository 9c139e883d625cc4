"""`dbt build` analogue: full-DAG materialize + attached data tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.plans.dag import MODELS, run_pipeline, topological_order
from dbt_jaffleshop_spark.testing import generic


def test_topological_order_respects_deps():
    order = topological_order()
    pos = {n: i for i, n in enumerate(order)}
    for name, spec in MODELS.items():
        for dep in spec.depends_on:
            assert pos[dep] < pos[name], f"{dep} must come before {name}"
    # 6 staging + 8 marts + 1 generated spine (reference models/ file count)
    assert len(order) == len(MODELS) == 15


@pytest.fixture(scope="module")
def built_warehouse(spark, sf_dir, tmp_path_factory):
    """One full pipeline build shared by the module's tests."""
    wh = str(tmp_path_factory.mktemp("warehouse"))
    results = run_pipeline(spark, sf_dir, warehouse_dir=wh)
    return wh, results


def test_run_pipeline_all_green(built_warehouse):
    _, results = built_warehouse
    bad = {k: v for k, v in results.items() if v["status"] != "ok"}
    assert not bad, f"pipeline failures: {bad}"


def test_orders_mart_partition_pruning(spark, built_warehouse):
    """The materialized orders mart is month-partitioned (SURVEY §7.4):
    a month-bounded read must prune at the PARTITION level — the physical
    scan carries a PartitionFilters entry on order_month and reads only
    the matching month's files, not the whole mart."""
    wh, _ = built_warehouse
    df = spark.read.parquet(f"{wh}/orders")
    assert "order_month" in df.columns  # partition column round-trips
    months = [r[0] for r in df.select("order_month").distinct().collect()]
    assert len(months) > 1, "need multiple month partitions to prove pruning"
    target = sorted(months)[0]

    bounded = df.filter(F.col("order_month") == F.lit(target))
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_month" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    # pruning is real: the bounded scan touches one partition's rows only
    per_month = df.groupBy("order_month").count().collect()
    expect = {r["order_month"]: r["count"] for r in per_month}[target]
    assert bounded.count() == expect


def test_read_mart_injects_partition_pruning(spark, built_warehouse):
    """read_mart turns an ordered_at date range into an injected
    order_month partition predicate (SURVEY §4.3-5 pruning-injection
    stretch): same rows as the naive row filter, but the physical scan
    prunes at the partition level."""
    from dbt_jaffleshop_spark.plans.dag import read_mart

    wh, _ = built_warehouse
    start, end = "1995-03-15", "1995-05-10"
    pruned = read_mart(spark, wh, "orders", date_between=(start, end))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "order_month" in pf[1].split("]", 1)[0], plan

    naive = (
        spark.read.parquet(f"{wh}/orders")
        .filter((F.col("ordered_at") >= start) & (F.col("ordered_at") <= end))
    )
    assert pruned.count() == naive.count()
    assert pruned.count() > 0


def test_generic_tests_catch_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c")], "id: long, v: string"
    )
    assert generic.not_null(df, "id").count() == 1
    assert generic.unique(df, "id").count() == 1  # id=1 duplicated
    assert generic.accepted_values(df, "v", ["a", "b"]).count() == 1
    parent = spark.createDataFrame([(1,)], "id: long")
    assert generic.relationships(df, "id", parent, "id").count() == 0  # NULL not a violation
    child = spark.createDataFrame([(2,)], "id: long")
    assert generic.relationships(child, "id", parent, "id").count() == 1
    assert generic.expression_is_true(df.filter(F.col("id").isNotNull()), "id > 0").count() == 0


def test_fail_fast_skips_descendants(spark, sf_dir, tmp_path, monkeypatch):
    """dbt build semantics under the threaded scheduler: a failing test
    marks the model failed and every transitive descendant is skipped,
    while independent branches still build."""
    import dataclasses

    from dbt_jaffleshop_spark.plans import dag

    bad = dataclasses.replace(
        dag.MODELS["stg_customers"],
        tests=dag.MODELS["stg_customers"].tests
        + [("always_fails", lambda dfs: dfs["stg_customers"].limit(1))],
    )
    monkeypatch.setitem(dag.MODELS, "stg_customers", bad)
    results = dag.run_pipeline(spark, sf_dir, warehouse_dir=str(tmp_path / "wh"))
    assert results["stg_customers"]["status"] == "test_failed"
    # orders declares stg_customers (fk test input); customers reads it
    assert results["orders"]["status"] == "skipped"
    assert results["customers"]["status"] == "skipped"
    assert results["customer_segmentation"]["status"] == "skipped"
    # independent branches are unaffected
    assert results["stg_orders"]["status"] == "ok"
    assert results["stg_products"]["status"] == "ok"
    assert results["metricflow_time_spine"]["status"] == "ok"


def test_incremental_rebuilds_only_affected_partitions(spark, sf_dir, built_warehouse):
    """Incremental materialization (dbt `incremental`, Spark-native):
    after dropping the newest month partition of the orders mart, an
    incremental run restores exactly that partition — and the files of
    every untouched partition are NOT rewritten."""
    import glob
    import os as _os
    import shutil

    wh, _ = built_warehouse
    orders_path = f"{wh}/orders"
    full_count = spark.read.parquet(orders_path).count()
    parts = sorted(glob.glob(f"{orders_path}/order_month=*"))
    assert len(parts) > 2
    victim = parts[-1]  # newest month: regresses the stored watermark
    keep_files = {
        f: _os.path.getmtime(f)
        for p in parts[:-1]
        for f in glob.glob(p + "/*.parquet")
    }
    shutil.rmtree(victim)
    assert spark.read.parquet(orders_path).count() < full_count

    results = run_pipeline(spark, sf_dir, warehouse_dir=wh, incremental=True)
    assert results["orders"]["status"] == "ok"
    assert spark.read.parquet(orders_path).count() == full_count
    assert _os.path.isdir(victim)
    for f, mtime in keep_files.items():
        assert _os.path.getmtime(f) == mtime, f"untouched partition rewritten: {f}"
