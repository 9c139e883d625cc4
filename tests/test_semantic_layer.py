"""Semantic/metric layer: saved-query oracle parity + compiler behavior
(SURVEY §2.10 M1–M7)."""

from __future__ import annotations

import pytest

from conftest import assert_parity

from dbt_jaffleshop_spark.semantic import (
    ORDERS_MODEL,
    SAVED_QUERIES,
    SEMANTIC_CATALOG,
    MetricQuery,
)


@pytest.mark.parametrize("name", sorted(SEMANTIC_CATALOG))
def test_saved_query_parity(spark, oracle, sf_dir, name):
    fn, sql = SEMANTIC_CATALOG[name]
    assert_parity(fn(spark, sf_dir), oracle, sql)


def test_unknown_metric_rejected():
    with pytest.raises(KeyError):
        MetricQuery(ORDERS_MODEL, metrics=["nope"], group_by=[])


def test_bad_grain_rejected(spark, sf_dir):
    q = MetricQuery(ORDERS_MODEL, metrics=["orders"], group_by=["metric_time__hour"])
    with pytest.raises(ValueError):
        q.to_df(spark, sf_dir)


def test_adhoc_metric_query_with_filter_dim(spark, oracle, sf_dir):
    """Ad-hoc (non-saved) request: filtered metrics grouped by a boolean
    dimension — the M2 filter path × M1 categorical dims."""
    q = MetricQuery(
        ORDERS_MODEL,
        metrics=["orders", "new_customer_orders", "large_orders"],
        group_by=["is_food_order"],
    )
    assert_parity(q.to_df(spark, sf_dir), oracle, q.to_oracle_sql())


def test_derived_offset_metric_nulls_first_period(spark, sf_dir):
    """revenue_growth_pct uses a 1-month offset (W5): the earliest month
    must be NULL (no prior period)."""
    q = SAVED_QUERIES["sq_order_metrics_monthly"]
    rows = q.to_df(spark, sf_dir).orderBy("metric_time").collect()
    assert rows[0]["revenue_growth_pct"] is None
    assert any(r["revenue_growth_pct"] is not None for r in rows[1:])


def test_quarter_and_year_grains_resolve(spark, oracle, sf_dir):
    """r7: quarter/year joined GRAIN_OK — a quarterly request compiles,
    matches its own generated oracle, and truncation really is
    quarterly (every metric_time is the first day of a quarter)."""
    from dbt_jaffleshop_spark.semantic.jaffle_models import ORDERS_MODEL
    from dbt_jaffleshop_spark.semantic.model import GRAIN_OK, MetricQuery
    from tests.conftest import assert_parity

    assert "quarter" in GRAIN_OK and "year" in GRAIN_OK
    q = MetricQuery(
        ORDERS_MODEL,
        metrics=["orders", "order_total_cents"],
        group_by=["metric_time__quarter"],
    )
    assert_parity(q.to_df(spark, sf_dir), oracle, q.to_oracle_sql())
    for r in q.to_df(spark, sf_dir).collect():
        assert r.metric_time.month in (1, 4, 7, 10) and r.metric_time.day == 1
    y = MetricQuery(
        ORDERS_MODEL, metrics=["orders"], group_by=["metric_time__year"]
    )
    assert_parity(y.to_df(spark, sf_dir), oracle, y.to_oracle_sql())

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported grain"):
        MetricQuery(
            ORDERS_MODEL, metrics=["orders"], group_by=["metric_time__hour"]
        ).to_df(spark, sf_dir)


def test_multi_model_metric_query_cross_model_join(spark, oracle, sf_dir):
    """r9 (VERDICT r8 item 7): one request drawing metrics from TWO
    semantic models — orders (order counts + filtered food orders) and
    order_items (revenue + the food_revenue_pct ratio) — resolved
    MetricFlow-style: each model aggregates independently at the shared
    metric_time__month grain, then the aggregates full-outer-join on
    metric_time. Verified row-for-row against the composed DuckDB
    oracle (both marts' CTE chains + FULL JOIN USING)."""
    from tests.conftest import assert_parity

    from dbt_jaffleshop_spark.semantic.jaffle_models import (
        ORDER_ITEMS_MODEL,
        ORDERS_MODEL,
    )
    from dbt_jaffleshop_spark.semantic.model import (
        MetricQuery,
        MultiModelMetricQuery,
    )

    mm = MultiModelMetricQuery([
        MetricQuery(ORDERS_MODEL, ["orders", "food_orders"],
                    ["metric_time__month"]),
        MetricQuery(ORDER_ITEMS_MODEL,
                    ["revenue_cents", "food_revenue_pct"],
                    ["metric_time__month"]),
    ])
    df = mm.to_df(spark, sf_dir)
    assert df.columns == [
        "metric_time", "orders", "food_orders",
        "revenue_cents", "food_revenue_pct",
    ]
    assert df.count() > 0
    assert_parity(df, oracle, mm.to_oracle_sql())


def test_multi_model_metric_query_rejects_bad_shapes(spark):
    """Group-by shape and metric-name-collision guards."""
    import pytest

    from dbt_jaffleshop_spark.semantic.jaffle_models import (
        ORDER_ITEMS_MODEL,
        ORDERS_MODEL,
    )
    from dbt_jaffleshop_spark.semantic.model import (
        MetricQuery,
        MultiModelMetricQuery,
    )

    a = MetricQuery(ORDERS_MODEL, ["orders"], ["metric_time__month"])
    with pytest.raises(ValueError, match="differ"):
        MultiModelMetricQuery([
            a,
            MetricQuery(ORDER_ITEMS_MODEL, ["revenue_cents"],
                        ["metric_time__week"]),
        ])
    with pytest.raises(ValueError, match=">= 2"):
        MultiModelMetricQuery([a])


def test_entity_join_group_by_resolves_foreign_dimension(spark, oracle, sf_dir):
    """r10 (VERDICT r9 item 4): order_items metrics grouped by
    location__location_name resolve through the order_id → location_id
    entity chain; full parity against the composed LEFT-JOIN oracle,
    and the result must equal the hand-written join+aggregate."""
    from pyspark.sql import functions as F

    from conftest import assert_parity
    from dbt_jaffleshop_spark.models import marts_analytics, marts_core
    from dbt_jaffleshop_spark.semantic.jaffle_models import SAVED_QUERIES

    q = SAVED_QUERIES["sq_items_by_location"]
    df = q.to_df(spark, sf_dir)
    assert_parity(df, oracle, q.to_oracle_sql())

    items = marts_core.order_items(spark, sf_dir)
    orders = marts_core.orders(spark, sf_dir).select("order_id", "location_id")
    locs = marts_analytics.locations(spark, sf_dir).select(
        "location_id", "location_name"
    )
    manual = (
        items.join(orders, "order_id", "left")
        .join(locs, "location_id", "left")
        .groupBy(
            F.expr("cast(date_trunc('month', ordered_at) as date)").alias(
                "metric_time"
            ),
            F.col("location_name").alias("location__location_name"),
        )
        .agg(
            F.expr("sum(product_price_cents)").alias("revenue_cents"),
            (
                F.expr(
                    "cast(sum(case when is_food_item then product_price_cents end) as double)"
                )
                / F.expr("cast(sum(product_price_cents) as double)")
            ).alias("food_revenue_pct"),
        )
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, manual.select(df.columns).collect()))
    assert got == want


def test_entity_join_unknown_path_and_dimension_fail_loudly():
    """Misdeclared entity group_bys raise at request-compile time."""
    import pytest

    from dbt_jaffleshop_spark.semantic.jaffle_models import ORDER_ITEMS_MODEL
    from dbt_jaffleshop_spark.semantic.model import MetricQuery

    with pytest.raises(KeyError, match="no entity path"):
        MetricQuery(
            ORDER_ITEMS_MODEL, metrics=["revenue_cents"],
            group_by=["supplier__supplier_name"],
        )._dims("spark")
    with pytest.raises(KeyError, match="no dimension"):
        MetricQuery(
            ORDER_ITEMS_MODEL, metrics=["revenue_cents"],
            group_by=["location__no_such_dim"],
        )._dims("spark")


def test_entity_join_single_hop_on_orders_model(spark, oracle, sf_dir):
    """1-hop entity path (orders.location_id → locations): both path
    lengths of the resolver stay covered. Composed-oracle parity plus
    a sanity identity: grouping by the joined location_name must
    aggregate the same totals as grouping by the local location_id."""
    from conftest import assert_parity
    from dbt_jaffleshop_spark.semantic.jaffle_models import ORDERS_MODEL
    from dbt_jaffleshop_spark.semantic.model import MetricQuery

    q = MetricQuery(
        ORDERS_MODEL,
        metrics=["orders", "order_total_cents"],
        group_by=["location__location_name"],
    )
    df = q.to_df(spark, sf_dir)
    assert_parity(df, oracle, q.to_oracle_sql())

    by_id = MetricQuery(
        ORDERS_MODEL,
        metrics=["orders", "order_total_cents"],
        group_by=["location"],
    ).to_df(spark, sf_dir)
    assert sorted(
        (r.orders, r.order_total_cents) for r in df.collect()
    ) == sorted((r.orders, r.order_total_cents) for r in by_id.collect())
