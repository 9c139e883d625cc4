"""dbt_utils relation-shaping analogues (functions/relations.py, r6):
union_relations column-superset semantics, deduplicate's WindowGroupLimit
plan, pivot's conditional-column expansion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.functions.relations import (
    deduplicate,
    pivot,
    union_relations,
)


def test_union_relations_column_superset(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a_only string")
    b = spark.createDataFrame([(2, 5.0)], "id long, b_only double")
    out = union_relations({"rel_a": a, "rel_b": b})
    assert out.columns == ["id", "a_only", "b_only", "_source_relation"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].a_only == "x" and rows[1].b_only is None
    assert rows[2].a_only is None and rows[2].b_only == 5.0
    assert rows[1]._source_relation == "rel_a"
    assert rows[2]._source_relation == "rel_b"
    # no shuffle: pure projections + union
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    no_src = union_relations({"a": a, "b": b}, include_source_column=False)
    assert no_src.columns == ["id", "a_only", "b_only"]
    with pytest.raises(ValueError):
        union_relations({})


def test_deduplicate_keeps_first_by_order(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "k long, ver long, payload string",
    )
    out = deduplicate(df, ["k"], [F.col("ver").desc()])
    rows = {r.k: r for r in out.collect()}
    assert rows[1].payload == "new" and rows[2].payload == "only"
    assert out.count() == 2
    assert "__dedup_rn" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # partial top-1 before the exchange


def test_pivot_conditional_columns(spark):
    df = spark.createDataFrame(
        [("c1", "placed", 3), ("c1", "shipped", 4), ("c2", "placed", 5)],
        "cust string, status string, qty long",
    )
    out = (
        pivot(df, "status", ["placed", "shipped"])
        .groupBy("cust")
        .agg(
            F.sum("status_placed").alias("placed"),
            F.sum("status_shipped").alias("shipped"),
        )
    )
    rows = {r.cust: r for r in out.collect()}
    assert (rows["c1"].placed, rows["c1"].shipped) == (1, 1)
    assert (rows["c2"].placed, rows["c2"].shipped) == (1, 0)

    valued = (
        pivot(df, "status", ["placed"], then_value=F.col("qty"))
        .groupBy("cust")
        .agg(F.sum("status_placed").alias("placed_qty"))
    )
    vrows = {r.cust: r for r in valued.collect()}
    assert vrows["c1"].placed_qty == 3 and vrows["c2"].placed_qty == 5

    with pytest.raises(ValueError):
        pivot(df, "status", ["placed"], agg="median; DROP TABLE")
