"""Declared semantic models + saved queries mirroring the reference's
semantic layer — ALL EIGHT reference semantic models (orders.yml:54-159,
customers.yml:35-109, order_items.yml:43-181, products.yml:39-125,
supplies.yml:41-131, locations.yml:35-125,
customer_segmentation.yml:35-130, time_analytics.yml:33-122;
SURVEY §2.10 M1–M7).

Money metrics aggregate exact integer cents (parity-stable under any
shuffle order); dollar-typed mart columns are quantized back to cents
(`cast(round(x * 1e2) as bigint)` — exact, they derive from cents) before
summing. avg measures over float-typed columns use `avg_q9` (1e-9
quantization → exact integer sum → one shared IEEE division chain), so no
order-dependent float accumulation exists anywhere in the layer — any
metrics × group_by request is deterministic, not just the frozen saved
queries (enforced by tests/test_property_based.py over all 8 models).
"""

from __future__ import annotations

import dataclasses

from ..models import marts_analytics, marts_core, marts_segmentation
from .model import (
    Dimension,
    EntityPath,
    Measure,
    Metric,
    MetricQuery,
    SemanticModel,
)

# --------------------------------------------------------------- orders

ORDERS_MODEL = SemanticModel(
    name="orders",
    mart="orders",
    base=marts_core.orders,
    agg_time_dimension="ordered_at",  # orders.yml:56-57 agg_time_dimension
    dimensions={
        "location": Dimension("location", "location_id"),
        "is_food_order": Dimension("is_food_order"),
    },
    measures={
        "order_count": Measure("order_count", "count", "order_id"),
        "order_total_cents_m": Measure("order_total_cents_m", "sum", "order_total_cents"),
        "order_cost_cents_m": Measure("order_cost_cents_m", "sum", "order_cost_cents"),
    },
    metrics={
        # simple metrics, 4 with filters (orders.yml:100-143 — P6)
        "orders": Metric("orders", "simple", measure="order_count"),
        "order_total_cents": Metric("order_total_cents", "simple", measure="order_total_cents_m"),
        "order_cost_cents": Metric("order_cost_cents", "simple", measure="order_cost_cents_m"),
        "food_orders": Metric("food_orders", "simple", measure="order_count", filter="is_food_order"),
        "drink_orders": Metric("drink_orders", "simple", measure="order_count", filter="is_drink_order"),
        "new_customer_orders": Metric(
            "new_customer_orders", "simple", measure="order_count",
            filter="customer_order_number = 1",  # orders.yml:112-113
        ),
        "large_orders": Metric(
            "large_orders", "simple", measure="order_count",
            filter="order_total_cents >= 2000",  # orders.yml:120-121 (≥ $20)
        ),
        # derived (customers.yml:87-95 shape): profit = revenue − cost
        "order_gross_profit_cents": Metric(
            "order_gross_profit_cents", "derived",
            expr="order_total_cents - order_cost_cents",
        ),
        # derived with offset_window 1 month (order_items.yml:138-149 — W5).
        # nullif guards the zero-revenue previous period (possible at fine
        # grains: itemless orders sum to 0) — NULL growth in both engines
        # instead of an ANSI divide-by-zero error.
        "revenue_growth_pct": Metric(
            "revenue_growth_pct", "derived",
            expr="(order_total_cents - lag_1(order_total_cents)) * 100e0"
                 " / nullif(lag_1(order_total_cents), 0)",
            offset_inputs=("order_total_cents",),
        ),
    },
)

# ------------------------------------------------------------- customers

CUSTOMERS_MODEL = SemanticModel(
    name="customers",
    mart="customers",
    base=marts_core.customers,
    agg_time_dimension="first_ordered_at",
    dimensions={
        "customer_type": Dimension("customer_type"),
        "customer_id": Dimension("customer_id"),
    },
    measures={
        "customer_count": Measure("customer_count", "count_distinct", "customer_id"),
        "lifetime_spend_cents_m": Measure("lifetime_spend_cents_m", "sum", "lifetime_spend_cents"),
        "avg_lifetime_spend_m": Measure("avg_lifetime_spend_m", "avg", "lifetime_spend_cents"),
        "median_lifetime_spend_m": Measure("median_lifetime_spend_m", "median", "lifetime_spend_cents"),
        # customers.yml measures feeding the derived average_order_value
        "lifetime_spend_pretax_cents_m": Measure(
            "lifetime_spend_pretax_cents_m", "sum", "lifetime_spend_pretax_cents"
        ),
        "count_lifetime_orders_m": Measure(
            "count_lifetime_orders_m", "sum", "count_lifetime_orders"
        ),
    },
    metrics={
        "customer_count": Metric("customer_count", "simple", measure="customer_count"),
        "lifetime_spend_cents_total": Metric(
            "lifetime_spend_cents_total", "simple", measure="lifetime_spend_cents_m"
        ),
        "avg_lifetime_spend_cents": Metric(
            "avg_lifetime_spend_cents", "simple", measure="avg_lifetime_spend_m"
        ),
        "median_lifetime_spend_cents": Metric(
            "median_lifetime_spend_cents", "simple", measure="median_lifetime_spend_m"
        ),
        "lifetime_spend_pretax_cents": Metric(
            "lifetime_spend_pretax_cents", "simple",
            measure="lifetime_spend_pretax_cents_m",
        ),
        "count_lifetime_orders": Metric(
            "count_lifetime_orders", "simple", measure="count_lifetime_orders_m"
        ),
        # customers.yml:87-95 — derived M4: LTV pre-tax / number of orders
        # (bigint / bigint is float division in BOTH engines: one
        # correctly-rounded IEEE op over exact integers)
        "average_order_value_cents": Metric(
            "average_order_value_cents", "derived",
            expr="lifetime_spend_pretax_cents / count_lifetime_orders",
        ),
    },
)

# ----------------------------------------------------------- order_items

ORDER_ITEMS_MODEL = SemanticModel(
    name="order_items",
    mart="order_items",
    base=marts_core.order_items,
    agg_time_dimension="ordered_at",
    dimensions={"is_food_item": Dimension("is_food_item")},
    measures={
        "revenue_cents_m": Measure("revenue_cents_m", "sum", "product_price_cents"),
        "food_rev_m": Measure("food_rev_m", "sum", "product_price_cents"),
        "median_price_m": Measure("median_price_m", "median", "product_price_cents"),
    },
    metrics={
        "revenue_cents": Metric("revenue_cents", "simple", measure="revenue_cents_m"),
        "food_revenue_cents": Metric(
            "food_revenue_cents", "simple", measure="food_rev_m",
            filter="is_food_item",  # order_items.yml:74-78 expr measure
        ),
        "median_item_price_cents": Metric(
            "median_item_price_cents", "simple", measure="median_price_m"
        ),
        # ratio metric (order_items.yml:122-135 — M3)
        "food_revenue_pct": Metric(
            "food_revenue_pct", "ratio",
            numerator="food_revenue_cents", denominator="revenue_cents",
        ),
        # cumulative metric (order_items.yml:162-167 — M5/W4)
        "cumulative_revenue_cents": Metric(
            "cumulative_revenue_cents", "cumulative", measure="revenue_cents"
        ),
    },
)

# --------------------------------------------------------------- products

# products.yml:39-125 — entity-grained performance metrics. The reference
# saved query groups by Entity('product'), i.e. the mart's primary key:
# every group is a single row, so the avg measure is exact by construction.
PRODUCTS_MODEL = SemanticModel(
    name="products",
    mart="products",
    base=marts_analytics.products,
    agg_time_dimension="",  # products.yml declares no time dimension
    dimensions={
        "product_id": Dimension("product_id"),
        "product_type": Dimension("product_type"),
        "performance_tier": Dimension("performance_tier"),
    },
    measures={
        "products_m": Measure("products_m", "count_distinct", "product_id"),
        "total_revenue_cents_m": Measure(
            "total_revenue_cents_m", "sum",
            "cast(round(total_revenue * 1e2) as bigint)",
        ),
        "total_profit_cents_m": Measure(
            "total_profit_cents_m", "sum",
            "cast(round(total_profit * 1e2) as bigint)",
        ),
        "total_quantity_m": Measure("total_quantity_m", "sum", "total_quantity_sold"),
        "avg_profit_margin_m": Measure(
            "avg_profit_margin_m", "avg_q9", "profit_margin_ratio"
        ),
    },
    metrics={
        "product_revenue_cents": Metric(
            "product_revenue_cents", "simple", measure="total_revenue_cents_m"
        ),
        "product_profit_cents": Metric(
            "product_profit_cents", "simple", measure="total_profit_cents_m"
        ),
        "product_count": Metric("product_count", "simple", measure="products_m"),
        "avg_profit_margin": Metric(
            "avg_profit_margin", "simple", measure="avg_profit_margin_m"
        ),
    },
)

# --------------------------------------------------------------- supplies

# supplies.yml:41-131. Entity('supply') resolves to supply_uuid — the
# mart's actual grain (same documented deviation as the mart itself:
# supply_id repeats across products, supply_uuid is the dbt surrogate key).
SUPPLIES_MODEL = SemanticModel(
    name="supplies",
    mart="supplies",
    base=marts_analytics.supplies,
    agg_time_dimension="",
    dimensions={
        "supply_uuid": Dimension("supply_uuid"),
        "usage_tier": Dimension("usage_tier"),
        "efficiency_tier": Dimension("efficiency_tier"),
        "risk_category": Dimension("risk_category"),
    },
    measures={
        "supplies_m": Measure("supplies_m", "count_distinct", "supply_uuid"),
        "supply_cost_cents_m": Measure(
            "supply_cost_cents_m", "sum", "supply_cost_incurred_cents"
        ),
        "supply_revenue_cents_m": Measure(
            "supply_revenue_cents_m", "sum", "revenue_generated_cents"
        ),
        "avg_efficiency_m": Measure(
            "avg_efficiency_m", "avg_q9", "revenue_to_cost_ratio"
        ),
    },
    metrics={
        "supply_cost_cents": Metric(
            "supply_cost_cents", "simple", measure="supply_cost_cents_m"
        ),
        "supply_revenue_cents": Metric(
            "supply_revenue_cents", "simple", measure="supply_revenue_cents_m"
        ),
        "supply_count": Metric("supply_count", "simple", measure="supplies_m"),
        "avg_supply_efficiency": Metric(
            "avg_supply_efficiency", "simple", measure="avg_efficiency_m"
        ),
    },
)

# -------------------------------------------------------------- locations

# locations.yml:35-125 — Entity('location') saved query (5 singleton groups).
LOCATIONS_MODEL = SemanticModel(
    name="locations",
    mart="locations",
    base=marts_analytics.locations,
    agg_time_dimension="opened_date",  # locations.yml defaults
    dimensions={
        "location_id": Dimension("location_id"),
        "location_name": Dimension("location_name"),
        "performance_tier": Dimension("performance_tier"),
        "retention_tier": Dimension("retention_tier"),
    },
    measures={
        "locations_m": Measure("locations_m", "count_distinct", "location_id"),
        "location_revenue_cents_m": Measure(
            "location_revenue_cents_m", "sum",
            "cast(round(total_revenue * 1e2) as bigint)",
        ),
        "location_profit_cents_m": Measure(
            "location_profit_cents_m", "sum",
            "cast(round(total_profit * 1e2) as bigint)",
        ),
        "avg_order_value_m": Measure("avg_order_value_m", "avg_q9", "avg_order_value"),
    },
    metrics={
        "location_revenue_cents": Metric(
            "location_revenue_cents", "simple", measure="location_revenue_cents_m"
        ),
        "location_profit_cents": Metric(
            "location_profit_cents", "simple", measure="location_profit_cents_m"
        ),
        "location_count": Metric("location_count", "simple", measure="locations_m"),
        "avg_location_order_value": Metric(
            "avg_location_order_value", "simple", measure="avg_order_value_m"
        ),
    },
)

# r10 (VERDICT r9 item 4): MetricFlow's entity-join resolution half —
# order_items metrics can group by a LOCATIONS dimension through the
# declared entity chain order_items.order_id → orders.location_id →
# locations (order_items.yml's `order` entity + orders.yml's `location`
# entity; MetricFlow composes them as location__<dim>). The rebind via
# dataclasses.replace keeps SemanticModel frozen while letting the path
# reference LOCATIONS_MODEL, declared above.
ORDER_ITEMS_MODEL = dataclasses.replace(
    ORDER_ITEMS_MODEL,
    entity_paths={
        "location": EntityPath(
            "location",
            hops=(("order_id", ORDERS_MODEL), ("location_id", LOCATIONS_MODEL)),
        ),
    },
)

# Single-hop variant on the orders model (orders.yml's `location`
# entity): orders metrics by a locations dimension directly through
# location_id — pytest-pinned alongside the 2-hop chain above so both
# path lengths stay covered.
ORDERS_MODEL = dataclasses.replace(
    ORDERS_MODEL,
    entity_paths={
        "location": EntityPath(
            "location", hops=(("location_id", LOCATIONS_MODEL),)
        ),
    },
)

# ------------------------------------------------- customer_segmentation

# customer_segmentation.yml:35-130 — includes the filtered
# high_value_customers metric (`clv_tier = 'High Value'`), the reference's
# last P6 metric-filter instance.
CUSTOMER_SEGMENTATION_MODEL = SemanticModel(
    name="customer_segmentation",
    mart="customer_segmentation",
    base=marts_segmentation.customer_segmentation,
    agg_time_dimension="first_ordered_at",
    dimensions={
        "customer_id": Dimension("customer_id"),
        "rfm_segment": Dimension("rfm_segment"),
        "clv_tier": Dimension("clv_tier"),
        "churn_risk": Dimension("churn_risk"),
    },
    measures={
        "customers_m": Measure("customers_m", "count_distinct", "customer_id"),
        "avg_rfm_score_m": Measure("avg_rfm_score_m", "avg_q9", "rfm_score"),
        "avg_lifetime_spend_seg_m": Measure(
            "avg_lifetime_spend_seg_m", "avg",
            "cast(round(lifetime_spend * 1e2) as bigint)",
        ),
        "avg_lifetime_orders_m": Measure(
            "avg_lifetime_orders_m", "avg", "count_lifetime_orders"
        ),
    },
    metrics={
        "customer_segments": Metric(
            "customer_segments", "simple", measure="customers_m"
        ),
        "avg_customer_rfm_score": Metric(
            "avg_customer_rfm_score", "simple", measure="avg_rfm_score_m"
        ),
        "avg_customer_lifetime_value_cents": Metric(
            "avg_customer_lifetime_value_cents", "simple",
            measure="avg_lifetime_spend_seg_m",
        ),
        # P6: filtered simple metric (customer_segmentation.yml:114-115)
        "high_value_customers": Metric(
            "high_value_customers", "simple", measure="customers_m",
            filter="clv_tier = 'High Value'",
        ),
    },
)

# ---------------------------------------------------------- time_analytics

# time_analytics.yml:33-122 — saved query grouped by
# TimeDimension('metric_time', 'month'). Groups span many days, so every
# sum runs over exact integers (cents recovered from the mart's
# coalesce-filled dollar doubles).
TIME_ANALYTICS_MODEL = SemanticModel(
    name="time_analytics",
    mart="time_analytics",
    base=marts_segmentation.time_analytics,
    agg_time_dimension="date_day",
    dimensions={
        "year": Dimension("year"),
        "quarter": Dimension("quarter"),
        "day_of_week": Dimension("day_of_week"),
    },
    measures={
        "daily_orders_m": Measure("daily_orders_m", "sum", "daily_orders"),
        "daily_revenue_cents_m": Measure(
            "daily_revenue_cents_m", "sum",
            "cast(round(daily_revenue * 1e2) as bigint)",
        ),
        "daily_profit_cents_m": Measure(
            "daily_profit_cents_m", "sum",
            "cast(round(daily_profit * 1e2) as bigint)",
        ),
        "daily_customers_m": Measure(
            "daily_customers_m", "sum", "daily_unique_customers"
        ),
    },
    metrics={
        "total_daily_orders": Metric(
            "total_daily_orders", "simple", measure="daily_orders_m"
        ),
        "total_daily_revenue_cents": Metric(
            "total_daily_revenue_cents", "simple", measure="daily_revenue_cents_m"
        ),
        "total_daily_profit_cents": Metric(
            "total_daily_profit_cents", "simple", measure="daily_profit_cents_m"
        ),
        # time_analytics.yml metric avg_daily_customers uses the
        # daily_unique_customers measure, whose declared agg is SUM — the
        # reference's own naming quirk, preserved faithfully.
        "avg_daily_customers": Metric(
            "avg_daily_customers", "simple", measure="daily_customers_m"
        ),
    },
)

# ------------------------------------------------------- saved queries (M6)

SAVED_QUERIES: dict[str, MetricQuery] = {
    # orders.yml:145-159 — order metrics by metric_time day
    "sq_order_metrics_daily": MetricQuery(
        ORDERS_MODEL,
        metrics=[
            "orders", "order_total_cents", "food_orders", "drink_orders",
            "new_customer_orders", "large_orders",
        ],
        group_by=["metric_time__day"],
    ),
    # monthly rollup exercising derived + offset-window metrics (M4/W5)
    "sq_order_metrics_monthly": MetricQuery(
        ORDERS_MODEL,
        metrics=[
            "orders", "order_total_cents", "order_gross_profit_cents",
            "revenue_growth_pct",
        ],
        group_by=["metric_time__month"],
    ),
    # entity-grouped rollup with count_distinct / exact-avg / median (A12)
    # + the customers.yml:87-95 derived average_order_value (M4)
    "sq_customer_metrics_by_type": MetricQuery(
        CUSTOMERS_MODEL,
        metrics=[
            "customer_count", "lifetime_spend_cents_total",
            "avg_lifetime_spend_cents", "median_lifetime_spend_cents",
            "count_lifetime_orders", "lifetime_spend_pretax_cents",
            "average_order_value_cents",
        ],
        group_by=["customer_type"],
    ),
    # order_items.yml:169-181 — ratio + cumulative by day
    "sq_revenue_cumulative_daily": MetricQuery(
        ORDER_ITEMS_MODEL,
        metrics=[
            "revenue_cents", "food_revenue_cents", "food_revenue_pct",
            "cumulative_revenue_cents",
        ],
        group_by=["metric_time__day"],
    ),
    # categorical-dimension group-by (M1 dims × M2 metrics)
    "sq_orders_by_location": MetricQuery(
        ORDERS_MODEL,
        metrics=["orders", "order_total_cents", "food_orders"],
        group_by=["location"],
    ),
    # r10 — ENTITY-JOIN resolution (VERDICT r9 item 4): order_items
    # metrics grouped by a locations dimension reached through the
    # order_items.order_id → orders.location_id → locations entity
    # chain (MetricFlow's location__location_name), month grain; the
    # ratio metric verifies post-aggregation math survives the joins
    "sq_items_by_location": MetricQuery(
        ORDER_ITEMS_MODEL,
        metrics=["revenue_cents", "food_revenue_pct"],
        group_by=["metric_time__month", "location__location_name"],
    ),
    # customers.yml:97-109 — customer_order_metrics by Entity('customer'):
    # the reference's own saved query for the derived average_order_value
    "sq_customer_order_metrics": MetricQuery(
        CUSTOMERS_MODEL,
        metrics=[
            "count_lifetime_orders", "lifetime_spend_pretax_cents",
            "average_order_value_cents",
        ],
        group_by=["customer_id"],
    ),
    # products.yml:112-125 — product_performance_metrics by Entity('product')
    "sq_product_performance": MetricQuery(
        PRODUCTS_MODEL,
        metrics=[
            "product_revenue_cents", "product_profit_cents",
            "product_count", "avg_profit_margin",
        ],
        group_by=["product_id"],
    ),
    # supplies.yml:118-131 — supply_chain_metrics by Entity('supply')
    "sq_supply_chain": MetricQuery(
        SUPPLIES_MODEL,
        metrics=[
            "supply_cost_cents", "supply_revenue_cents",
            "supply_count", "avg_supply_efficiency",
        ],
        group_by=["supply_uuid"],
    ),
    # locations.yml:112-125 — location_performance_metrics by Entity('location')
    "sq_location_performance": MetricQuery(
        LOCATIONS_MODEL,
        metrics=[
            "location_revenue_cents", "location_profit_cents",
            "location_count", "avg_location_order_value",
        ],
        group_by=["location_id"],
    ),
    # customer_segmentation.yml:117-130 — incl. filtered high_value_customers (P6)
    "sq_customer_segmentation": MetricQuery(
        CUSTOMER_SEGMENTATION_MODEL,
        metrics=[
            "customer_segments", "avg_customer_rfm_score",
            "avg_customer_lifetime_value_cents", "high_value_customers",
        ],
        group_by=["customer_id"],
    ),
    # time_analytics.yml:109-122 — the reference saved query proper:
    # TimeDimension('metric_time', 'month') (yml:118). This MONTH-grain
    # query backs the time_analytics_metrics export (plans/exports.py)
    # so export consumers get exactly the rows the reference framework
    # produces.
    "sq_time_analytics_monthly": MetricQuery(
        TIME_ANALYTICS_MODEL,
        metrics=[
            "total_daily_orders", "total_daily_revenue_cents",
            "total_daily_profit_cents", "avg_daily_customers",
        ],
        group_by=["metric_time__month"],
    ),
    # ADDITIONAL quarter-grain variant (kept as the registered driver
    # query — it exercises the metric_time quarter grain, M7; the
    # mart's own seasonal analysis, time_analytics.sql:69-71, is
    # quarterly). Not the export's source — see sq_time_analytics_monthly.
    "sq_time_analytics_quarterly": MetricQuery(
        TIME_ANALYTICS_MODEL,
        metrics=[
            "total_daily_orders", "total_daily_revenue_cents",
            "total_daily_profit_cents", "avg_daily_customers",
        ],
        group_by=["metric_time__quarter"],
    ),
}


def mm_order_metrics_monthly():
    """The canonical CROSS-MODEL metric request (r9 — MetricFlow's
    join-resolution core): order counts + filtered food-order counts
    from the `orders` semantic model joined with item revenue + the
    food-revenue ratio from the `order_items` model, both at the
    metric_time month grain. Built fresh per call (MetricQuery frames
    are session-bound); digest-verified through jaffle_rollups_digest
    against the composed FULL-JOIN DuckDB oracle."""
    from .model import MetricQuery, MultiModelMetricQuery

    return MultiModelMetricQuery([
        MetricQuery(ORDERS_MODEL, ["orders", "food_orders"],
                    ["metric_time__month"]),
        MetricQuery(ORDER_ITEMS_MODEL,
                    ["revenue_cents", "food_revenue_pct"],
                    ["metric_time__month"]),
    ])
