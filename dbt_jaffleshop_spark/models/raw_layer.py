"""Role-mapping of the driver's TPC-H-ish testdata onto the reference's raw
source tables (FIXTURES.md §3; reference source catalog:
models/staging/__sources.yml:3-22, schemas README.md:196-203).

The reference's pipeline starts from six ``raw`` tables (customers, orders,
items, products, supplies, stores). The driver provides a TPC-H-ish star
schema instead, so this module derives the raw tables **deterministically
and SQL-expressibly** from it — the DuckDB oracle applies the identical
derivation, so every downstream model is independently checkable.

Exactness: money doubles → integer cents via round(x*100) (see
functions/money.py); all derived ids/flags use integer modulo — both
engines agree bit-for-bit.

Mapping contract (keep in sync with queries/oracle_jaffle.py RAW_CTES):

* raw_customers(id, name)                      ← customer
* raw_orders(id, customer, ordered_at, store_id, subtotal, tax_paid,
  order_total)  [cents]                        ← orders
      store_id = o_orderkey % 5; tax = 8% of subtotal (cents) so the
      reference invariant order_total - tax_paid = subtotal holds.
* raw_items(id, order_id, sku)                 ← lineitem
      id = (l_orderkey*10 + l_linenumber)*100 + row_number over
      (l_orderkey, l_linenumber) ordered by (partkey, suppkey, quantity,
      extendedprice) — the *100+rn disambiguates duplicate line numbers
* raw_products(sku, name, type, price, description)  ← part
      type = 'jaffle' if p_partkey even else 'beverage'
* raw_supplies(id, name, cost, perishable, sku)      ← distinct lineitem
      (l_suppkey, l_partkey) pairs; multi-row-per-product grain preserved
      (the reference's supplies are N rows per sku — order_items.yml:15-41
      pins the pre-aggregate-then-join semantics).
* raw_stores(id, name, opened_at, tax_rate)    ← region (5 rows ≈ 6 seeds)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dollars_to_cents
from ..sources import load_table


def raw_customers(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))


def raw_orders(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """raw_orders with the reference's conservation laws BY CONSTRUCTION
    (FIXTURES.md §1): subtotal = Σ item prices of the order's items (pinned
    by orders.yml:5-7), tax = 8% of subtotal rounded down to a cent, and
    order_total = subtotal + tax (stg_orders.yml:5-7). The item-price
    aggregation is a map-side-combinable hash agg on l_orderkey followed by
    an equi-join — at 100 TB both shuffle on the order key once."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)

    item_prices = (
        li.select("l_orderkey", "l_partkey")
        .join(
            part.select(
                F.col("p_partkey").alias("l_partkey"),
                dollars_to_cents(F.col("p_retailprice")).alias("price_cents"),
            ),
            "l_partkey",
        )
        .groupBy("l_orderkey")
        .agg(F.sum("price_cents").alias("items_subtotal"))
    )
    joined = o.join(
        item_prices, o["o_orderkey"] == item_prices["l_orderkey"], "left"
    )
    subtotal = F.coalesce(F.col("items_subtotal"), F.lit(0))
    # integer 8% tax: (s*8 - (s*8) % 100) / 100 — exact in both engines
    tax_paid = ((subtotal * 8 - (subtotal * 8) % 100) / 100).cast("long")
    return joined.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("customer"),
        F.col("o_orderdate").alias("ordered_at"),
        (F.col("o_orderkey") % 5).alias("store_id"),
        subtotal.alias("subtotal"),
        tax_paid.alias("tax_paid"),
        (subtotal + tax_paid).alias("order_total"),
    )


def raw_items(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # The synthetic lineitem contains duplicate (l_orderkey, l_linenumber)
    # pairs (including fully identical rows), so the item id needs a
    # disambiguator. A row_number PARTITIONED by the pair shuffles on the
    # key (scales; no global window); identical rows get interchangeable
    # sequence numbers, so the resulting relation is value-deterministic.
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
        )
    )
    return li.select(
        ((F.col("l_orderkey") * 10 + F.col("l_linenumber")) * 100 + rn).alias("id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("sku"),
    )


def raw_products(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        F.col("p_partkey").alias("sku"),
        F.col("p_name").alias("name"),
        F.when(F.col("p_partkey") % 2 == 0, F.lit("jaffle"))
        .otherwise(F.lit("beverage"))
        .alias("type"),
        dollars_to_cents(F.col("p_retailprice")).alias("price"),
        F.col("p_type").alias("description"),
    )


def raw_supplies(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # distinct (supplier, part) pairs — a shuffle on the pair key only; at
    # 100 TB this is the natural dedup grain and far smaller than lineitem.
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    return pairs.select(
        F.col("l_suppkey").alias("id"),
        F.concat(F.lit("SUP-"), F.col("l_suppkey").cast("string")).alias("name"),
        ((F.col("l_suppkey") * 7 + F.col("l_partkey") * 3) % 500 + 10).alias("cost"),
        (F.col("l_partkey") % 2 == 0).alias("perishable"),
        F.col("l_partkey").alias("sku"),
    )


def raw_stores(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    r = load_table(spark, "region", sf_dir)
    return r.select(
        F.col("r_regionkey").cast("long").alias("id"),
        F.col("r_name").alias("name"),
        (F.lit("1994-01-01").cast("date") + F.col("r_regionkey") * 100)
        .cast("timestamp")
        .alias("opened_at"),
        ((F.col("r_regionkey") + 4) / F.lit(100.0)).alias("tax_rate"),
    )


RAW_BUILDERS = {
    "raw_customers": raw_customers,
    "raw_orders": raw_orders,
    "raw_items": raw_items,
    "raw_products": raw_products,
    "raw_supplies": raw_supplies,
    "raw_stores": raw_stores,
}
