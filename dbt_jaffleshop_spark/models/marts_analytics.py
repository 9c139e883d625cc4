"""Analytics marts: products, supplies, locations.

Reference: models/marts/products.sql (172 LoC), supplies.sql (185),
locations.sql (156). Operators: J4 (dim←fact fan-out then agg), A5-A7
(positional multi-key group by, re-aggregation, avg/stddev), A9
(safe-division), A10 (distinct over fan-out), W2 (global rankings), J5
(agg-on-agg assembly), F6/F7/F9/F11.

Determinism deviations (SURVEY §4.3, applied identically in the DuckDB
oracle):

* Global ranking windows get an explicit ``DESC NULLS LAST`` plus the
  entity id as tie-breaker (the reference's bare ``order by x desc`` is
  nondeterministic on ties).
* ``avg(x)`` over money is computed as ``(SUM(cents)/100.0)/COUNT(x)``
  and ``stddev`` via exact integer sums of cents and cents² — identical
  IEEE operation sequences in Spark and DuckDB, so results are
  bit-stable under any partitioning (a plain double ``SUM`` is
  accumulation-order-dependent and would flap under shuffle).
* The supplies mart joins its sub-analyses on ``supply_uuid`` — the true
  row grain — where the reference joins on ``supply_id``
  (supplies.sql:147-186). supply_id repeats across skus (FIXTURES.md §1),
  so the reference's join fans out quadratically per supplier; at our
  data's supplier×part cardinality that is both wrong-shaped and
  unscalable. Semantics per-row are unchanged.

Scale: the W2 global rankings run on post-aggregation frames (one row per
product / supply / location), so the single-partition window is bounded by
dimension cardinality, not fact rows (SURVEY §7.4). All fact-side
aggregations are partial+final hash aggs; joins after aggregation are on
already-reduced frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import marts_core, staging
from .base import cached, ref


def _dollars(cents_sum: Column) -> Column:
    return cents_sum / F.lit(100.0)


def _guarded_avg(cents_col: str, count_col: Column) -> Column:
    """(SUM(cents)/100.0)/COUNT — NULL when the group has no rows."""
    return F.when(
        count_col > 0, _dollars(F.sum(cents_col)) / count_col
    )


# --------------------------------------------------------------- products
def product_performance(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """products.sql:20-52 — J4 fan-out + multi-agg with safe division."""
    prods = staging.stg_products(spark, sf_dir).drop("product_price_cents")
    items = cached("order_items", marts_core.order_items, spark, sf_dir).select(
        "product_id", "order_id", "order_item_id",
        F.col("product_price_cents").alias("item_price_cents"),
        F.col("supply_cost_cents").alias("item_supply_cost_cents"),
    )
    n_items = F.count("order_item_id")
    sum_price = F.sum("item_price_cents")
    sum_cost = F.sum("item_supply_cost_cents")
    return (
        prods.join(items, "product_id", "left")
        .groupBy(
            "product_id", "product_name", "product_type", "product_description",
            "product_price", "is_food_item", "is_drink_item",
        )
        .agg(
            F.countDistinct("order_id").alias("total_orders"),
            n_items.alias("total_quantity_sold"),
            _dollars(sum_price).alias("total_revenue"),
            _dollars(sum_cost).alias("total_supply_cost"),
            (_dollars(sum_price) - _dollars(sum_cost)).alias("total_profit"),
            F.when(
                sum_cost > 0,
                (_dollars(sum_price) - _dollars(sum_cost)) / _dollars(sum_cost),
            ).alias("profit_margin_ratio"),
            _guarded_avg("item_price_cents", n_items).alias("avg_selling_price"),
            _guarded_avg("item_supply_cost_cents", n_items).alias("avg_supply_cost"),
        )
    )


def products(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/products.sql:1-172."""
    perf = ref("product_performance", product_performance, spark, sf_dir)
    items = cached("order_items", marts_core.order_items, spark, sf_dir)
    # chain orders through the CACHED order_items (the _logic seam, same
    # policy as customer_segmentation): `marts_core.orders` as a builder
    # would rebuild the whole order_items join tree a second time inside
    # the cached orders plan (r14; the before-plan shows the doubled
    # lineage). Values identical — orders_logic over the same input.
    orders_ = cached(
        "orders",
        lambda s, sf: marts_core.orders_logic(staging.stg_orders(s, sf), items),
        spark, sf_dir,
    ).select("order_id", "location_id")

    def rank(col: str) -> Column:
        return F.row_number().over(
            Window.orderBy(F.col(col).desc_nulls_last(), F.col("product_id").asc())
        )

    rankings = (
        perf.withColumn("revenue_rank", rank("total_revenue"))
        .withColumn("popularity_rank", rank("total_quantity_sold"))
        .withColumn("profit_rank", rank("total_profit"))
        .withColumn("margin_rank", rank("profit_margin_ratio"))
    )

    # seasonal_analysis (products.sql:70-84): A5 multi-key group by.
    seasonal = items.groupBy(
        "product_id",
        F.quarter("ordered_at").alias("order_quarter"),
        F.month("ordered_at").alias("order_month"),
    ).agg(
        F.count("order_item_id").alias("quarterly_quantity"),
        F.sum("product_price_cents").alias("quarterly_revenue_cents"),
        _dollars(F.sum("product_price_cents")).alias("quarterly_revenue"),
    )

    # product_seasonal_summary (products.sql:105-138): A6 re-aggregation.
    seasonal_summary = seasonal.groupBy("product_id").agg(
        F.max("quarterly_revenue").alias("peak_quarter_revenue"),
        F.min("quarterly_revenue").alias("low_quarter_revenue"),
        (_dollars(F.sum("quarterly_revenue_cents")) / F.count(F.lit(1))).alias(
            "avg_quarterly_revenue"
        ),
        F.when(
            F.max("quarterly_revenue") > 0,
            (F.max("quarterly_revenue") - F.min("quarterly_revenue"))
            / F.max("quarterly_revenue"),
        )
        .otherwise(F.lit(0.0))
        .alias("seasonality_index"),
    )

    # location_analysis + product_location_summary (products.sql:86-120).
    loc_analysis = (
        items.join(orders_, "order_id", "left")
        .groupBy("product_id", "location_id")
        .agg(
            F.count("order_item_id").alias("location_quantity"),
            _dollars(F.sum("product_price_cents")).alias("location_revenue"),
        )
    )
    loc_summary = loc_analysis.groupBy("product_id").agg(
        F.countDistinct("location_id").alias("locations_sold_at"),
        F.max("location_revenue").alias("best_location_revenue"),
        F.min("location_revenue").alias("worst_location_revenue"),
    )

    final = (
        rankings.join(loc_summary, "product_id", "left")
        .join(seasonal_summary, "product_id", "left")
        .withColumns(
            {
                "locations_sold_at": F.coalesce("locations_sold_at", F.lit(0)),
                "best_location_revenue": F.coalesce("best_location_revenue", F.lit(0.0)),
                "worst_location_revenue": F.coalesce("worst_location_revenue", F.lit(0.0)),
                "peak_quarter_revenue": F.coalesce("peak_quarter_revenue", F.lit(0.0)),
                "low_quarter_revenue": F.coalesce("low_quarter_revenue", F.lit(0.0)),
                "avg_quarterly_revenue": F.coalesce("avg_quarterly_revenue", F.lit(0.0)),
                "seasonality_index": F.coalesce("seasonality_index", F.lit(0.0)),
                "performance_tier": F.when(F.col("revenue_rank") <= 5, "Top Performer")
                .when(F.col("revenue_rank") <= 10, "High Performer")
                .when(F.col("revenue_rank") <= 20, "Medium Performer")
                .otherwise("Low Performer"),
            }
        )
    )
    return final


# --------------------------------------------------------------- supplies
def supply_performance(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """supplies.sql:20-54 — J4 fan-out at (supply_uuid × items) grain.

    Scale rewrite (A11 agg-before-join): the reference's shape joins every
    supply row to every item of its product and re-aggregates — an N:M
    blow-up (~150M intermediate rows at sf0.1; unbounded at 100 TB). But
    each supply of a product sees the *identical* item set, so the item
    aggregates are computed once per product (|products| rows) and joined
    to supplies afterwards — bit-identical output (same aggregate inputs,
    same derived-expression shapes), fan-out eliminated. The per-product
    aggregate is map-side combinable and the join side is broadcastable.
    """
    supplies = staging.stg_supplies(spark, sf_dir)
    items = cached("order_items", marts_core.order_items, spark, sf_dir).select(
        "product_id", "order_id", "order_item_id", "product_price_cents",
        F.col("supply_cost_cents").alias("item_supply_cost_cents"),
    )
    n_items = F.count("order_item_id")
    sum_price = F.sum("product_price_cents")
    sum_incurred = F.sum("item_supply_cost_cents")
    per_product = items.groupBy("product_id").agg(
        F.countDistinct("order_id").alias("orders_using_supply"),
        n_items.alias("total_usage_quantity"),
        sum_price.alias("revenue_generated_cents"),
        sum_incurred.alias("supply_cost_incurred_cents"),
    )
    joined = supplies.select(
        "supply_uuid", "supply_id", "supply_name", "product_id",
        "supply_cost", "supply_cost_cents", "is_perishable_supply",
    ).join(per_product, "product_id", "left")
    # products with no items: counts aggregate to 0 over an empty group,
    # sums to NULL — reproduce exactly after the outer join.
    usage = F.coalesce(F.col("total_usage_quantity"), F.lit(0))
    rev = F.col("revenue_generated_cents")
    incurred = F.col("supply_cost_incurred_cents")
    return joined.select(
        "supply_uuid", "supply_id", "supply_name", "product_id",
        "supply_cost", "supply_cost_cents", "is_perishable_supply",
        F.coalesce(F.col("orders_using_supply"), F.lit(0)).alias("orders_using_supply"),
        usage.alias("total_usage_quantity"),
        rev.alias("revenue_generated_cents"),
        _dollars(rev).alias("revenue_generated"),
        incurred.alias("supply_cost_incurred_cents"),
        _dollars(incurred).alias("total_supply_cost_incurred"),
        F.when(incurred > 0, _dollars(rev) / _dollars(incurred)).alias(
            "revenue_to_cost_ratio"
        ),
        F.when(usage > 0, _dollars(rev) / usage).alias("avg_product_selling_price"),
        F.when(
            usage > 0, (incurred / F.lit(100.0)) / usage
        ).otherwise(F.col("supply_cost")).alias("avg_cost_per_usage"),
    )


def supplier_analysis(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """supplies.sql:73-97 — declared-but-unused CTE in the reference's final
    select; implemented as a standalone analysis (SURVEY §2.12 note)."""
    supplies = staging.stg_supplies(spark, sf_dir).select(
        "supply_uuid", "supply_name", "product_id", "supply_cost_cents"
    )
    perf = cached("supply_performance", supply_performance, spark, sf_dir).select(
        "supply_uuid",
        "total_usage_quantity",
        "revenue_generated_cents",
        "supply_cost_incurred_cents",
    )
    n_cost = F.count("supply_cost_cents")
    return (
        supplies.join(perf, "supply_uuid", "left")
        .groupBy("supply_name")
        .agg(
            F.countDistinct("product_id").alias("products_supplied"),
            _guarded_avg("supply_cost_cents", n_cost).alias("avg_supply_cost"),
            F.sum("total_usage_quantity").alias("total_supplier_usage"),
            _dollars(F.sum("revenue_generated_cents")).alias("total_supplier_revenue"),
            F.when(
                F.sum("supply_cost_incurred_cents") > 0,
                _dollars(F.sum("revenue_generated_cents"))
                / _dollars(F.sum("supply_cost_incurred_cents")),
            ).alias("supplier_efficiency_ratio"),
        )
    )


def supplies(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/supplies.sql:1-185."""
    perf = cached("supply_performance", supply_performance, spark, sf_dir)

    def rank(col: str) -> Column:
        return F.row_number().over(
            Window.orderBy(F.col(col).desc_nulls_last(), F.col("supply_uuid").asc())
        )

    # W2 global ranks: the supply grain grows with data (unlike the other
    # W2 sites), so rank over a NARROW (key, 4 sort cols) projection —
    # four single-partition sorts of ~40 bytes/row instead of the full
    # wide mart row — then hash-join the ranks back on supply_uuid.
    rank_frame = (
        perf.select(
            "supply_uuid", "total_usage_quantity", "revenue_generated",
            "revenue_to_cost_ratio", "total_supply_cost_incurred",
        )
        .withColumn("usage_rank", rank("total_usage_quantity"))
        .withColumn("revenue_contribution_rank", rank("revenue_generated"))
        .withColumn("efficiency_rank", rank("revenue_to_cost_ratio"))
        .withColumn("cost_rank", rank("total_supply_cost_incurred"))
        .select(
            "supply_uuid", "usage_rank", "revenue_contribution_rank",
            "efficiency_rank", "cost_rank",
        )
    )
    rankings = perf.join(rank_frame, "supply_uuid")

    # inventory_turnover (supplies.sql:99-122) + cost_variance (:124-143),
    # both at supply_uuid grain (see module docstring for the deviation).
    enriched = rankings.withColumns(
        {
            "inventory_turnover_ratio": F.when(
                (F.col("supply_cost") > 0) & (F.col("total_usage_quantity") > 0),
                F.col("total_supply_cost_incurred") / F.col("supply_cost"),
            ).otherwise(F.lit(0.0)),
            "avg_days_between_usage": F.coalesce(
                F.when(
                    F.col("total_usage_quantity") > 0,
                    F.lit(365.0) / F.col("total_usage_quantity"),
                ),
                F.lit(0.0),
            ),
            "cost_variance_percentage": F.when(
                F.col("supply_cost") > 0,
                (F.col("avg_cost_per_usage") - F.col("supply_cost")) / F.col("supply_cost"),
            ).otherwise(F.lit(0.0)),
            "absolute_cost_variance": F.coalesce(
                F.abs(F.col("avg_cost_per_usage") - F.col("supply_cost")), F.lit(0.0)
            ),
        }
    )
    return enriched.withColumns(
        {
            "usage_tier": F.when(F.col("usage_rank") <= 5, "High Usage")
            .when(F.col("usage_rank") <= 15, "Medium Usage")
            .otherwise("Low Usage"),
            "efficiency_tier": F.when(F.col("efficiency_rank") <= 5, "High Efficiency")
            .when(F.col("efficiency_rank") <= 15, "Medium Efficiency")
            .otherwise("Low Efficiency"),
            "risk_category": F.when(
                F.col("is_perishable_supply") & (F.col("avg_days_between_usage") > 7),
                "Risk: Slow Moving Perishable",
            )
            .when(
                (~F.col("is_perishable_supply")) & (F.col("avg_days_between_usage") > 30),
                "Risk: Slow Moving",
            )
            .when(F.col("cost_variance_percentage") > 0.2, "Risk: High Cost Variance")
            .otherwise("Normal"),
        }
    )


# --------------------------------------------------------------- locations
def locations(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/locations.sql:1-156 (A4 conditional distinct
    counts, A7 avg/stddev, J7 mart←mart join, W2 rankings, J5 assembly)."""
    locs = staging.stg_locations(spark, sf_dir)
    # orders feeds BOTH the performance and behavior branches, and the
    # customers mart rebuilds the orders tree internally — cache orders
    # once and chain customers through it (same policy as
    # customer_segmentation; memoized, released via release_cached()).
    orders_ = cached("orders", marts_core.orders, spark, sf_dir)
    customers_ = cached(
        "customers",
        lambda s, sf: marts_core.customers_logic(
            staging.stg_customers(s, sf), orders_
        ),
        spark, sf_dir,
    )

    n_orders = F.countDistinct("order_id")
    sum_total = F.sum("order_total_cents")
    sum_cost = F.sum("order_cost_cents")

    performance = (
        locs.join(orders_, "location_id", "left")
        .groupBy("location_id", "location_name", "tax_rate", "opened_date")
        .agg(
            n_orders.alias("total_orders"),
            F.countDistinct("customer_id").alias("unique_customers"),
            _dollars(sum_total).alias("total_revenue"),
            _dollars(F.sum("tax_paid_cents")).alias("total_tax_collected"),
            _dollars(sum_cost).alias("total_supply_cost"),
            (_dollars(sum_total) - _dollars(sum_cost)).alias("total_profit"),
            _guarded_avg("order_total_cents", F.count("order_total_cents")).alias(
                "avg_order_value"
            ),
            _guarded_avg("order_cost_cents", F.count("order_cost_cents")).alias(
                "avg_order_cost"
            ),
            F.when(
                sum_cost > 0, (_dollars(sum_total) - _dollars(sum_cost)) / _dollars(sum_cost)
            ).alias("profit_margin_ratio"),
            F.sum(F.when(F.col("is_food_order"), 1).otherwise(0)).alias("food_orders"),
            F.sum(F.when(F.col("is_drink_order"), 1).otherwise(0)).alias("drink_orders"),
            F.countDistinct(
                F.when(F.col("customer_order_number") == 1, F.col("customer_id"))
            ).alias("new_customers"),
            F.countDistinct(
                F.when(F.col("customer_order_number") > 1, F.col("customer_id"))
            ).alias("returning_customers"),
        )
    )

    def rank(col: str) -> Column:
        return F.row_number().over(
            Window.orderBy(F.col(col).desc_nulls_last(), F.col("location_id").asc())
        )

    rankings = performance.withColumns(
        {
            "revenue_rank": rank("total_revenue"),
            "order_volume_rank": rank("total_orders"),
            "customer_base_rank": rank("unique_customers"),
            "aov_rank": rank("avg_order_value"),
            "profitability_rank": rank("profit_margin_ratio"),
        }
    )

    # customer_behavior_analysis (locations.sql:77-101): J7 mart←mart.
    behavior = (
        orders_.select("location_id", "customer_id")
        .join(
            customers_.select(
                "customer_id", "count_lifetime_orders", "lifetime_spend_cents",
                "customer_type",
            ),
            "customer_id",
            "left",
        )
        .groupBy("location_id")
        .agg(
            F.when(
                F.count("count_lifetime_orders") > 0,
                F.sum("count_lifetime_orders") / F.count("count_lifetime_orders"),
            ).alias("avg_customer_lifetime_orders"),
            _guarded_avg("lifetime_spend_cents", F.count("lifetime_spend_cents")).alias(
                "avg_customer_lifetime_value"
            ),
            F.countDistinct(
                F.when(F.col("customer_type") == "new", F.col("customer_id"))
            ).alias("new_customer_count"),
            F.countDistinct(
                F.when(F.col("customer_type") == "returning", F.col("customer_id"))
            ).alias("returning_customer_count"),
            F.when(
                F.countDistinct("customer_id") > 0,
                F.countDistinct(
                    F.when(F.col("customer_type") == "returning", F.col("customer_id"))
                )
                * F.lit(1.0)
                / F.countDistinct("customer_id"),
            )
            .otherwise(F.lit(0.0))
            .alias("customer_retention_rate"),
        )
        .drop("new_customer_count", "returning_customer_count")
    )

    # supply_chain_efficiency (locations.sql:103-117): A7 stddev via exact
    # integer sums of cents and cents² (see module docstring).
    profit = F.col("order_total_cents") - F.col("order_cost_cents")
    efficiency = (
        orders_.select(
            "location_id",
            profit.alias("profit_cents"),
            (profit.cast(T.DecimalType(38, 0)) * profit).alias("profit_cents_sq"),
        )
        .groupBy("location_id")
        .agg(
            F.count("profit_cents").alias("n_profit"),
            F.sum("profit_cents").alias("sum_profit_cents"),
            F.sum("profit_cents_sq").cast("double").alias("sum_profit_cents_sq"),
        )
        .select(
            "location_id",
            F.when(
                F.col("n_profit") > 0,
                (F.col("sum_profit_cents") / F.lit(100.0)) / F.col("n_profit"),
            ).alias("avg_profit_per_order"),
            F.when(
                F.col("n_profit") > 1,
                F.sqrt(
                    (
                        F.col("sum_profit_cents_sq")
                        - F.col("sum_profit_cents").cast("double")
                        * F.col("sum_profit_cents").cast("double")
                        / F.col("n_profit")
                    )
                    / (F.col("n_profit") - 1)
                )
                / F.lit(100.0),
            ).alias("profit_variance"),
        )
        .withColumn(
            "profit_coefficient_of_variation",
            F.when(
                F.col("avg_profit_per_order") > 0,
                F.col("profit_variance") / F.col("avg_profit_per_order"),
            ),
        )
    )

    final = (
        rankings.join(behavior, "location_id", "left")
        .join(efficiency, "location_id", "left")
        .withColumns(
            {
                "avg_customer_lifetime_orders": F.coalesce(
                    "avg_customer_lifetime_orders", F.lit(0.0)
                ),
                "avg_customer_lifetime_value": F.coalesce(
                    "avg_customer_lifetime_value", F.lit(0.0)
                ),
                "customer_retention_rate": F.coalesce(
                    "customer_retention_rate", F.lit(0.0)
                ),
                "avg_profit_per_order": F.coalesce("avg_profit_per_order", F.lit(0.0)),
                "profit_variance": F.coalesce("profit_variance", F.lit(0.0)),
                "profit_coefficient_of_variation": F.coalesce(
                    "profit_coefficient_of_variation", F.lit(0.0)
                ),
                "performance_tier": F.when(F.col("revenue_rank") <= 2, "Top Performer")
                .when(F.col("revenue_rank") <= 4, "High Performer")
                .otherwise("Standard Performer"),
            }
        )
        .withColumn(
            "retention_tier",
            F.when(F.col("customer_retention_rate") >= 0.7, "High Retention")
            .when(F.col("customer_retention_rate") >= 0.5, "Medium Retention")
            .otherwise("Low Retention"),
        )
    )
    return final
