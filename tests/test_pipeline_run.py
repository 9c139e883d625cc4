"""`dbt build` analogue: full-DAG materialize + attached data tests."""

from __future__ import annotations

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


def test_run_pipeline_all_green(spark, sf_dir, tmp_path):
    results = run_pipeline(spark, sf_dir, warehouse_dir=str(tmp_path / "warehouse"))
    bad = {k: v for k, v in results.items() if v["status"] != "ok"}
    assert not bad, f"pipeline failures: {bad}"


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
