"""Staging layer — 1:1 cleaning projections over raw sources.

Reference models (all materialized as views, dbt_project.yml:33-34):
stg_customers.sql, stg_orders.sql, stg_order_items.sql, stg_products.sql,
stg_supplies.sql, stg_locations.sql. Each is a pure rename/retype
projection (SURVEY §2.2 P1/P2) — in Spark these stay **lazy DataFrames**
(the view materialization policy), so Catalyst inlines them into consumers
and pushes filters/column pruning through to the parquet scans.

Money columns exist twice: exact integer ``*_cents`` (used by downstream
aggregation for order-independent exact sums) and dollar doubles (the
user-facing columns, = cents / 100.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.keys import surrogate_key
from ..functions.money import cents_to_dollars_double
from . import raw_layer


def stg_customers(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/staging/stg_customers.sql:11-19 (P1 rename)."""
    return raw_layer.raw_customers(spark, sf_dir).select(
        F.col("id").alias("customer_id"),
        F.col("name").alias("customer_name"),
    )


def stg_orders(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/staging/stg_orders.sql:11-28 (P2: rename +
    cents→dollars + day-truncation)."""
    return raw_layer.raw_orders(spark, sf_dir).select(
        F.col("id").alias("order_id"),
        F.col("store_id").alias("location_id"),
        F.col("customer").alias("customer_id"),
        F.col("subtotal").alias("subtotal_cents"),
        F.col("tax_paid").alias("tax_paid_cents"),
        F.col("order_total").alias("order_total_cents"),
        cents_to_dollars_double(F.col("subtotal")).alias("subtotal"),
        cents_to_dollars_double(F.col("tax_paid")).alias("tax_paid"),
        cents_to_dollars_double(F.col("order_total")).alias("order_total"),
        F.col("ordered_at").cast("date").alias("ordered_at"),
    )


def stg_order_items(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/staging/stg_order_items.sql:11-18 (P1 rename)."""
    return raw_layer.raw_items(spark, sf_dir).select(
        F.col("id").alias("order_item_id"),
        F.col("order_id").alias("order_id"),
        F.col("sku").alias("product_id"),
    )


def stg_products(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/staging/stg_products.sql:11-30 (P2 + boolean flags
    F8: is_food_item / is_drink_item from the type column)."""
    return raw_layer.raw_products(spark, sf_dir).select(
        F.col("sku").alias("product_id"),
        F.col("name").alias("product_name"),
        F.col("type").alias("product_type"),
        F.col("description").alias("product_description"),
        F.col("price").alias("product_price_cents"),
        cents_to_dollars_double(F.col("price")).alias("product_price"),
        F.coalesce(F.col("type") == "jaffle", F.lit(False)).alias("is_food_item"),
        F.coalesce(F.col("type") == "beverage", F.lit(False)).alias("is_drink_item"),
    )


def stg_supplies(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/staging/stg_supplies.sql:11-27 (P2 + F13 md5
    surrogate key over (id, sku) — dbt_utils.generate_surrogate_key)."""
    return raw_layer.raw_supplies(spark, sf_dir).select(
        surrogate_key(F.col("id"), F.col("sku")).alias("supply_uuid"),
        F.col("id").alias("supply_id"),
        F.col("sku").alias("product_id"),
        F.col("name").alias("supply_name"),
        F.col("cost").alias("supply_cost_cents"),
        cents_to_dollars_double(F.col("cost")).alias("supply_cost"),
        F.col("perishable").alias("is_perishable_supply"),
    )


def stg_locations_logic(raw_stores: DataFrame) -> DataFrame:
    """stg_locations over an explicit input — the unit-test seam
    (stg_locations.yml:11-43)."""
    return raw_stores.select(
        F.col("id").alias("location_id"),
        F.col("name").alias("location_name"),
        F.col("tax_rate").alias("tax_rate"),
        F.col("opened_at").cast("date").alias("opened_date"),
    )


def stg_locations(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/staging/stg_locations.sql:11-29 (P2 + F1
    timestamp→date truncation, pinned by the unit test
    stg_locations.yml:11-43)."""
    return stg_locations_logic(raw_layer.raw_stores(spark, sf_dir))


STAGING_BUILDERS = {
    "stg_customers": stg_customers,
    "stg_orders": stg_orders,
    "stg_order_items": stg_order_items,
    "stg_products": stg_products,
    "stg_supplies": stg_supplies,
    "stg_locations": stg_locations,
}
