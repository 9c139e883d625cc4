"""Core marts: order_items → orders → customers.

Reference: models/marts/order_items.sql (66 LoC), orders.sql (77),
customers.sql (58). These three form the spine of the DAG (SURVEY §0.2) and
exercise A11 (grain-changing pre-agg before join), J2/J3/J1 (left-join
chains), A1-A4 (multi-agg group by), F8 (count→boolean), W1 (row_number per
customer), F7 (CASE ladder).

Scale notes (100 TB):
* every join is an equi-join on a single key; Spark shuffles both sides on
  the key (sort-merge) or broadcasts when one side is small — AQE decides
  at runtime from real sizes, so no hard-coded broadcast hints on
  fact-to-fact joins.
* ``order_supplies_summary`` aggregates supplies to product grain BEFORE
  the join (A11) — Catalyst does not do agg-before-join rewrites, so the
  model encodes it, shrinking the join's build side by the fan-out factor.
* money sums use exact integer cents (order-independent under shuffle);
  dollar doubles derive at the output edge.
* ``customer_order_number`` adds ``order_id`` as a tie-breaker to the
  reference's ``order by ordered_at`` — same semantics when timestamps are
  unique, deterministic when they are not (SURVEY §4.3-3 determinism
  policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import cents_to_dollars_double
from . import staging
from .base import ref


def order_items_logic(
    items: DataFrame, orders_: DataFrame, products: DataFrame, supplies: DataFrame
) -> DataFrame:
    """order_items over explicit inputs — the unit-test seam (SURVEY §2.9
    T6: fixture rows replace each ref()/source() input)."""
    # A11: supplies carries N rows per product — aggregate to product grain
    # first (order_items.sql:28-38; semantics pinned by order_items.yml:15-41).
    order_supplies_summary = supplies.groupBy("product_id").agg(
        F.sum("supply_cost_cents").alias("supply_cost_cents")
    )

    joined = (
        items
        # J2 chain (order_items.sql:55-62)
        .join(orders_.select("order_id", "ordered_at"), "order_id", "left")
        .join(
            products.select(
                "product_id", "product_name", "product_price_cents",
                "product_price", "is_food_item", "is_drink_item",
            ),
            "product_id",
            "left",
        )
        .join(order_supplies_summary, "product_id", "left")
    )
    return joined.select(
        "order_item_id",
        "order_id",
        "product_id",
        "ordered_at",
        "product_name",
        "product_price_cents",
        "product_price",
        "is_food_item",
        "is_drink_item",
        "supply_cost_cents",
        cents_to_dollars_double(F.col("supply_cost_cents")).alias("supply_cost"),
    )


def order_items(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/order_items.sql:1-66."""
    return order_items_logic(
        staging.stg_order_items(spark, sf_dir),
        staging.stg_orders(spark, sf_dir),
        staging.stg_products(spark, sf_dir),
        staging.stg_supplies(spark, sf_dir),
    )


def orders_logic(orders_: DataFrame, items: DataFrame) -> DataFrame:
    """orders over explicit inputs — the unit-test seam."""
    # order_items_summary (orders.sql:15-40): A3 conditional counts.
    items_summary = items.groupBy("order_id").agg(
        F.sum("supply_cost_cents").alias("order_cost_cents"),
        F.sum("product_price_cents").alias("order_items_subtotal_cents"),
        F.count("order_item_id").alias("count_order_items"),
        F.sum(F.when(F.col("is_food_item"), 1).otherwise(0)).alias("count_food_items"),
        F.sum(F.when(F.col("is_drink_item"), 1).otherwise(0)).alias("count_drink_items"),
    )

    # compute_booleans (orders.sql:42-66): F8 count→boolean. Orders with no
    # items (possible in the synthetic data) get zeroed summaries so the
    # reference invariant order_items_subtotal = subtotal holds (F6).
    with_summary = orders_.join(items_summary, "order_id", "left").withColumns(
        {
            "order_cost_cents": F.coalesce(F.col("order_cost_cents"), F.lit(0)),
            "order_items_subtotal_cents": F.coalesce(
                F.col("order_items_subtotal_cents"), F.lit(0)
            ),
            "count_order_items": F.coalesce(F.col("count_order_items"), F.lit(0)),
            "count_food_items": F.coalesce(F.col("count_food_items"), F.lit(0)),
            "count_drink_items": F.coalesce(F.col("count_drink_items"), F.lit(0)),
        }
    ).withColumns(
        {
            "order_cost": cents_to_dollars_double(F.col("order_cost_cents")),
            "order_items_subtotal": cents_to_dollars_double(
                F.col("order_items_subtotal_cents")
            ),
            "is_food_order": F.col("count_food_items") > 0,
            "is_drink_order": F.col("count_drink_items") > 0,
        }
    )

    # customer_order_count (orders.sql:68-75): W1 row_number per customer.
    w = Window.partitionBy("customer_id").orderBy(
        F.col("ordered_at").asc(), F.col("order_id").asc()
    )
    return with_summary.withColumn("customer_order_number", F.row_number().over(w))


def orders(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/orders.sql:1-77."""
    return orders_logic(
        staging.stg_orders(spark, sf_dir),
        ref("order_items", order_items, spark, sf_dir),
    )


def customers_logic(custs: DataFrame, orders_: DataFrame) -> DataFrame:
    """customers over explicit inputs — the unit-test seam."""
    summary = orders_.groupBy("customer_id").agg(
        F.countDistinct("order_id").alias("count_lifetime_orders"),
        (F.countDistinct("order_id") > 1).alias("is_repeat_buyer"),
        F.min("ordered_at").alias("first_ordered_at"),
        F.max("ordered_at").alias("last_ordered_at"),
        F.sum("subtotal_cents").alias("lifetime_spend_pretax_cents"),
        F.sum("tax_paid_cents").alias("lifetime_tax_paid_cents"),
        F.sum("order_total_cents").alias("lifetime_spend_cents"),
    )

    joined = custs.join(summary, "customer_id", "left")
    return joined.select(
        "customer_id",
        "customer_name",
        "count_lifetime_orders",
        "first_ordered_at",
        "last_ordered_at",
        "lifetime_spend_pretax_cents",
        "lifetime_tax_paid_cents",
        "lifetime_spend_cents",
        cents_to_dollars_double(F.col("lifetime_spend_pretax_cents")).alias(
            "lifetime_spend_pretax"
        ),
        cents_to_dollars_double(F.col("lifetime_tax_paid_cents")).alias(
            "lifetime_tax_paid"
        ),
        cents_to_dollars_double(F.col("lifetime_spend_cents")).alias("lifetime_spend"),
        F.when(F.col("is_repeat_buyer"), F.lit("returning"))
        .otherwise(F.lit("new"))
        .alias("customer_type"),
    )


def customers(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/customers.sql:1-58 (A1/A2 lifetime summary,
    J1 dim←agg left join, F7 new/returning ladder)."""
    return customers_logic(
        staging.stg_customers(spark, sf_dir),
        ref("orders", orders, spark, sf_dir),
    )
