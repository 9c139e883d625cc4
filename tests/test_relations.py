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


def test_pivot_applies_aggregate(spark):
    df = spark.createDataFrame(
        [("c1", "placed", 3), ("c1", "placed", 9), ("c1", "shipped", 4),
         ("c2", "placed", 5)],
        "cust string, status string, qty long",
    )
    out = pivot(df, "status", ["placed", "shipped"], group_by=["cust"])
    rows = {r.cust: r for r in out.collect()}
    assert (rows["c1"].status_placed, rows["c1"].status_shipped) == (2, 1)
    assert (rows["c2"].status_placed, rows["c2"].status_shipped) == (1, 0)

    # the agg parameter genuinely changes semantics (the r6 review found
    # a version where it was validated but never applied)
    summed = pivot(
        df, "status", ["placed"], group_by=["cust"], then_value=F.col("qty")
    )
    maxed = pivot(
        df, "status", ["placed"], group_by=["cust"],
        agg="max", then_value=F.col("qty"),
    )
    assert {r.cust: r.status_placed for r in summed.collect()} == {
        "c1": 12, "c2": 5,
    }
    assert {r.cust: r.status_placed for r in maxed.collect()} == {
        "c1": 9, "c2": 5,
    }

    with pytest.raises(ValueError):
        pivot(df, "status", ["placed"], group_by=["cust"],
              agg="median; DROP TABLE")
    with pytest.raises(ValueError):
        pivot(df, "status", ["placed"], group_by=[])


def test_union_relations_and_deduplicate_guards(spark):
    a = spark.createDataFrame([(1, "x")], "id long, _source_relation string")
    with pytest.raises(ValueError, match="source_column_name"):
        union_relations({"a": a})
    d = spark.createDataFrame([(1, 2)], "k long, __dedup_rn long")
    with pytest.raises(ValueError, match="__dedup_rn"):
        deduplicate(d, ["k"], [F.col("k").asc()])
    plain = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="partition"):
        deduplicate(plain, [], [F.col("v").asc()])
