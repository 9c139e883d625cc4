"""Driver-facing queries for the declarative test operators (SURVEY §2.9
T1–T5): each entry IS a test query — its result rows are the violations,
so on valid data each returns 0 rows with a stable schema (the dbt
failure-row contract). The DuckDB oracles run the same check over the
same derived pipeline, so row-count parity (0 == 0) plus schema compare
validates the operator shape end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..models import marts_core, staging
from ..models.base import ref
from ..testing import generic
from .oracle_jaffle import jaffle_sql


def t1_not_null_customers_pk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """T1 (customers.yml:11-13): customers.customer_id IS NULL rows."""
    return generic.not_null(
        ref("customers", marts_core.customers, spark, sf_dir), "customer_id"
    ).select("customer_id")


def t2_unique_orders_pk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """T2 (orders.yml:14-16): duplicate orders.order_id values."""
    return generic.unique(
        ref("orders", marts_core.orders, spark, sf_dir), "order_id"
    )


def t3_accepted_values_customer_type(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """T3 (customers.yml:30-33): customer_type outside {new, returning}."""
    return generic.accepted_values(
        ref("customers", marts_core.customers, spark, sf_dir),
        "customer_type", ["new", "returning"],
    )


def t4_relationships_items_orders(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """T4 (stg_order_items.yml:13-17): order_items.order_id missing from
    stg_orders — LEFT ANTI join semantics."""
    return generic.relationships(
        staging.stg_order_items(spark, sf_dir), "order_id",
        staging.stg_orders(spark, sf_dir), "order_id",
    )


def t5_orders_conservation(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """T5 (stg_orders.yml:5-7): rows violating
    order_total - tax_paid = subtotal (exact integer cents)."""
    return generic.expression_is_true(
        staging.stg_orders(spark, sf_dir),
        "order_total_cents - tax_paid_cents = subtotal_cents",
    ).select("order_id", "subtotal_cents", "tax_paid_cents", "order_total_cents")


TEST_SUITE_CATALOG = {
    "t1_not_null_customers_pk": (
        t1_not_null_customers_pk,
        jaffle_sql("customers", "SELECT customer_id FROM customers WHERE customer_id IS NULL"),
    ),
    "t2_unique_orders_pk": (
        t2_unique_orders_pk,
        jaffle_sql(
            "orders",
            "SELECT order_id, count(*) AS n_records FROM orders_mart"
            " GROUP BY order_id HAVING count(*) > 1",
        ),
    ),
    "t3_accepted_values_customer_type": (
        t3_accepted_values_customer_type,
        jaffle_sql(
            "customers",
            "SELECT customer_type, count(*) AS n_records FROM customers"
            " WHERE customer_type NOT IN ('new', 'returning')"
            " AND customer_type IS NOT NULL GROUP BY customer_type",
        ),
    ),
    "t4_relationships_items_orders": (
        t4_relationships_items_orders,
        # closure via order_items brings both stg_order_items and stg_orders
        jaffle_sql(
            "order_items",
            "SELECT i.order_id FROM stg_order_items i"
            " LEFT JOIN (SELECT DISTINCT order_id FROM stg_orders) o"
            " ON i.order_id = o.order_id"
            " WHERE i.order_id IS NOT NULL AND o.order_id IS NULL",
        ),
    ),
    "t5_orders_conservation": (
        t5_orders_conservation,
        jaffle_sql(
            "stg_orders",
            "SELECT order_id, subtotal_cents, tax_paid_cents, order_total_cents"
            " FROM stg_orders WHERE NOT COALESCE("
            "order_total_cents - tax_paid_cents = subtotal_cents, FALSE)",
        ),
    ),
}
