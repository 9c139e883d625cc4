"""Declared semantic models + saved queries mirroring the reference's
semantic layer (orders.yml:54-159, customers.yml:35-109,
order_items.yml:43-181; SURVEY §2.10 M1–M7).

Money metrics aggregate exact integer cents (parity-stable under any
shuffle order); dollar values derive at the edge when needed.
"""

from __future__ import annotations

from ..models import marts_core
from .model import Dimension, Measure, Metric, MetricQuery, SemanticModel

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
        # derived with offset_window 1 month (order_items.yml:138-149 — W5)
        "revenue_growth_pct": Metric(
            "revenue_growth_pct", "derived",
            expr="(order_total_cents - lag_1(order_total_cents)) * 100e0"
                 " / lag_1(order_total_cents)",
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
    dimensions={"customer_type": Dimension("customer_type")},
    measures={
        "customer_count": Measure("customer_count", "count_distinct", "customer_id"),
        "lifetime_spend_cents_m": Measure("lifetime_spend_cents_m", "sum", "lifetime_spend_cents"),
        "avg_lifetime_spend_m": Measure("avg_lifetime_spend_m", "avg", "lifetime_spend_cents"),
        "median_lifetime_spend_m": Measure("median_lifetime_spend_m", "median", "lifetime_spend_cents"),
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
    "sq_customer_metrics_by_type": MetricQuery(
        CUSTOMERS_MODEL,
        metrics=[
            "customer_count", "lifetime_spend_cents_total",
            "avg_lifetime_spend_cents", "median_lifetime_spend_cents",
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
}
