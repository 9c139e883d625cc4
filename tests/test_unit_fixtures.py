"""The reference's three inline unit tests, ported verbatim (FIXTURES.md §2;
SURVEY §5-3). These pin the subtlest semantics: timestamp→date truncation,
count→boolean conversion, and duplicate-key join fan-out."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import types as T

from dbt_jaffleshop_spark.models.marts_core import order_items_logic, orders_logic
from dbt_jaffleshop_spark.models.staging import stg_locations_logic
from dbt_jaffleshop_spark.testing.unit import assert_rows_match, fixture_df

LONG = T.LongType()
STR = T.StringType()
DBL = T.DoubleType()
BOOL = T.BooleanType()
TS = T.TimestampType()
DATE = T.DateType()


def test_does_location_opened_at_trunc_to_date(spark):
    """stg_locations.yml:11-43 — timestamp truncates to date, including a
    far-future sub-second timestamp."""
    raw_stores = fixture_df(
        spark,
        T.StructType([
            T.StructField("id", LONG), T.StructField("name", STR),
            T.StructField("tax_rate", DBL), T.StructField("opened_at", TS),
        ]),
        [
            {"id": 1, "name": "Vice City", "tax_rate": 0.2,
             "opened_at": dt.datetime(2016, 9, 1)},
            {"id": 2, "name": "San Andreas", "tax_rate": 0.1,
             "opened_at": dt.datetime(2079, 10, 27, 23, 59, 59, 999900)},
        ],
    )
    assert_rows_match(
        stg_locations_logic(raw_stores),
        [
            {"location_id": 1, "location_name": "Vice City", "tax_rate": 0.2,
             "opened_date": dt.date(2016, 9, 1)},
            {"location_id": 2, "location_name": "San Andreas", "tax_rate": 0.1,
             "opened_date": dt.date(2079, 10, 27)},
        ],
    )


def test_order_items_compute_to_bools_correctly(spark):
    """orders.yml:35-52 — food/drink item counts become booleans."""
    items_schema = T.StructType([
        T.StructField("order_id", LONG), T.StructField("order_item_id", LONG),
        T.StructField("is_drink_item", BOOL), T.StructField("is_food_item", BOOL),
        T.StructField("product_price_cents", LONG),
        T.StructField("supply_cost_cents", LONG),
    ])
    orders_schema = T.StructType([
        T.StructField("order_id", LONG), T.StructField("location_id", LONG),
        T.StructField("customer_id", LONG),
        T.StructField("subtotal_cents", LONG), T.StructField("tax_paid_cents", LONG),
        T.StructField("order_total_cents", LONG),
        T.StructField("subtotal", DBL), T.StructField("tax_paid", DBL),
        T.StructField("order_total", DBL), T.StructField("ordered_at", DATE),
    ])
    items = fixture_df(spark, items_schema, [
        {"order_id": 1, "order_item_id": 1, "is_drink_item": False, "is_food_item": True},
        {"order_id": 1, "order_item_id": 2, "is_drink_item": True, "is_food_item": False},
        {"order_id": 2, "order_item_id": 3, "is_drink_item": False, "is_food_item": True},
    ])
    stg_orders = fixture_df(spark, orders_schema, [{"order_id": 1}, {"order_id": 2}])
    assert_rows_match(
        orders_logic(stg_orders, items),
        [
            {"order_id": 1, "count_food_items": 1, "count_drink_items": 1,
             "is_drink_order": True, "is_food_order": True},
            {"order_id": 2, "count_food_items": 1, "count_drink_items": 0,
             "is_drink_order": False, "is_food_order": True},
        ],
    )


def test_supply_costs_sum_correctly(spark):
    """order_items.yml:14-41 — supplies pre-aggregate to product grain
    (3.50 + 5.00 = 8.50) and duplicate item rows keep the summed cost."""
    supplies_schema = T.StructType([
        T.StructField("supply_uuid", STR), T.StructField("supply_id", LONG),
        T.StructField("product_id", LONG), T.StructField("supply_name", STR),
        T.StructField("supply_cost_cents", LONG), T.StructField("supply_cost", DBL),
        T.StructField("is_perishable_supply", BOOL),
    ])
    products_schema = T.StructType([
        T.StructField("product_id", LONG), T.StructField("product_name", STR),
        T.StructField("product_type", STR), T.StructField("product_description", STR),
        T.StructField("product_price_cents", LONG), T.StructField("product_price", DBL),
        T.StructField("is_food_item", BOOL), T.StructField("is_drink_item", BOOL),
    ])
    items_schema = T.StructType([
        T.StructField("order_item_id", LONG), T.StructField("order_id", LONG),
        T.StructField("product_id", LONG),
    ])
    orders_schema = T.StructType([
        T.StructField("order_id", LONG), T.StructField("location_id", LONG),
        T.StructField("customer_id", LONG),
        T.StructField("subtotal_cents", LONG), T.StructField("tax_paid_cents", LONG),
        T.StructField("order_total_cents", LONG),
        T.StructField("subtotal", DBL), T.StructField("tax_paid", DBL),
        T.StructField("order_total", DBL), T.StructField("ordered_at", DATE),
    ])

    supplies = fixture_df(spark, supplies_schema, [
        {"supply_uuid": "a", "product_id": 1, "supply_cost_cents": 450, "supply_cost": 4.50},
        {"supply_uuid": "b", "product_id": 2, "supply_cost_cents": 350, "supply_cost": 3.50},
        {"supply_uuid": "c", "product_id": 2, "supply_cost_cents": 500, "supply_cost": 5.00},
    ])
    products = fixture_df(spark, products_schema, [{"product_id": 1}, {"product_id": 2}])
    items = fixture_df(spark, items_schema, [
        {"order_item_id": 10, "order_id": 1, "product_id": 1},
        {"order_item_id": 11, "order_id": 2, "product_id": 2},
        {"order_item_id": 12, "order_id": 2, "product_id": 2},
    ])
    stg_orders = fixture_df(spark, orders_schema, [{"order_id": 1}, {"order_id": 2}])

    assert_rows_match(
        order_items_logic(items, stg_orders, products, supplies),
        [
            {"order_id": 1, "product_id": 1, "supply_cost": 4.50},
            {"order_id": 2, "product_id": 2, "supply_cost": 8.50},
            {"order_id": 2, "product_id": 2, "supply_cost": 8.50},
        ],
    )
