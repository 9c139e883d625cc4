"""Segmentation & time-series marts: metricflow_time_spine,
customer_segmentation, time_analytics (+ the reference's declared-but-unused
time CTEs as standalone analyses).

Reference: models/marts/customer_segmentation.sql (222 LoC),
time_analytics.sql (179), metricflow_time_spine.sql (19). Operators: F3/F4
(datediff vs frozen as-of clock), F7 (six CASE ladders incl. the 11-branch
RFM segment ladder), A3/A4/A8/A10, J5/J6 (spine densification), W3 (lag),
F1/F2, S5 (row-generating spine), F10, P3/P4.

Determinism adaptations (mirrored in the DuckDB oracle):

* ``current_date`` → frozen ``as_of`` (functions/dates.py DEFAULT_AS_OF;
  SURVEY §4.3-1). The spine covers the testdata's date span instead of the
  reference's 10-years-ending-today (metricflow_time_spine.sql:7).
* ``mode() within group`` (customer_segmentation.sql:147) → deterministic
  most-frequent with (count DESC, name ASC) tie-break via row_number
  (SURVEY §4.3-3; F.mode is tie-nondeterministic).
* RFM monetary / CLV band constants are scaled from the reference's
  jaffle-dollar magnitudes (25..150) to the TPC-H money distribution —
  the ladder operators are identical, only literals differ
  (customer_segmentation.sql:49-57,96-108).

Scale: spine joins broadcast (a spine is ~thousands of rows); daily/weekly/
monthly summaries are single hash-aggs over the orders mart; the lag window
operates on the monthly grain (≤ hundreds of rows). The RFM path is one
pass over the customers mart plus two aggregations of orders/order_items at
customer grain.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dates import DEFAULT_AS_OF, date_spine
from . import marts_core, staging
from .base import cached, ref

SPINE_START = dt.date(1992, 1, 1)
ANALYTICS_START = dt.date(1995, 1, 1)

# RFM band constants, scaled to TPC-H money (reference:
# customer_segmentation.sql:42-57 uses 30/60/90/180 days, 10/7/4/2 orders,
# 100/75/50/25 dollars).
RECENCY_BANDS = (30, 60, 90, 180)
FREQUENCY_BANDS = (10, 7, 4, 2)
MONETARY_BANDS = (1000.0, 750.0, 500.0, 250.0)
CLV_BANDS = (1500.0, 750.0, 250.0)


def metricflow_time_spine(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/metricflow_time_spine.sql:1-19 (S5/F12)."""
    return date_spine(spark, SPINE_START, DEFAULT_AS_OF, "date_day")


def customer_segmentation(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/customer_segmentation.sql:1-222.

    Cache policy (SURVEY §4.1/§7.4): the six analysis CTEs each consume
    the same three mart inputs; without materialization Catalyst replans
    the whole upstream join tree per branch (9 orders scans / 6 lineitem
    scans in the physical plan). Inside a pipeline run ref() resolves to
    the written tables; standalone, cache each input once — they are
    customer/order-grain frames, orders of magnitude smaller than the
    raw fact tables they derive from."""
    # cached() memoizes per (session, name, sf_dir) so repeated standalone
    # invocations reuse ONE cached plan instead of leaking a new cached RDD
    # per call; release via models.base.release_cached().
    items = cached("order_items", marts_core.order_items, spark, sf_dir)
    # chain through the _logic seams so each cached level feeds the next —
    # the order_items subtree is built once, not once per mart input
    orders_ = cached(
        "orders",
        lambda s, sf: marts_core.orders_logic(staging.stg_orders(s, sf), items),
        spark, sf_dir,
    )
    customers_ = cached(
        "customers",
        lambda s, sf: marts_core.customers_logic(
            staging.stg_customers(s, sf), orders_
        ),
        spark, sf_dir,
    )
    as_of = F.lit(DEFAULT_AS_OF.isoformat()).cast("date")

    # rfm_analysis (:21-66): P3 filter + F3 datediff + three band ladders.
    days_since = F.datediff(as_of, F.col("last_ordered_at"))
    rfm = customers_.filter(F.col("customer_id").isNotNull()).select(
        "customer_id",
        "customer_name",
        "customer_type",
        "count_lifetime_orders",
        "lifetime_spend",
        "first_ordered_at",
        "last_ordered_at",
        days_since.alias("days_since_last_order"),
        F.col("count_lifetime_orders").alias("frequency_score"),
        F.col("lifetime_spend").alias("monetary_score"),
        F.when(days_since <= RECENCY_BANDS[0], 5)
        .when(days_since <= RECENCY_BANDS[1], 4)
        .when(days_since <= RECENCY_BANDS[2], 3)
        .when(days_since <= RECENCY_BANDS[3], 2)
        .otherwise(1)
        .alias("recency_score"),
        F.when(F.col("count_lifetime_orders") >= FREQUENCY_BANDS[0], 5)
        .when(F.col("count_lifetime_orders") >= FREQUENCY_BANDS[1], 4)
        .when(F.col("count_lifetime_orders") >= FREQUENCY_BANDS[2], 3)
        .when(F.col("count_lifetime_orders") >= FREQUENCY_BANDS[3], 2)
        .otherwise(1)
        .alias("frequency_quintile"),
        F.when(F.col("lifetime_spend") >= MONETARY_BANDS[0], 5)
        .when(F.col("lifetime_spend") >= MONETARY_BANDS[1], 4)
        .when(F.col("lifetime_spend") >= MONETARY_BANDS[2], 3)
        .when(F.col("lifetime_spend") >= MONETARY_BANDS[3], 2)
        .otherwise(1)
        .alias("monetary_quintile"),
    )

    # rfm_segments (:68-110): 11-branch ladder — branch order is semantics.
    r, f_, m = F.col("recency_score"), F.col("frequency_quintile"), F.col("monetary_quintile")
    rfm_segments = rfm.withColumns(
        {
            "rfm_score": (r + f_ + m) / F.lit(3.0),
            "rfm_segment": F.when((r >= 4) & (f_ >= 4) & (m >= 4), "Champions")
            .when((r >= 3) & (f_ >= 3) & (m >= 3), "Loyal Customers")
            .when((r >= 4) & (f_ <= 2) & (m >= 3), "Potential Loyalists")
            .when((r >= 4) & (f_ <= 2) & (m <= 2), "New Customers")
            .when((r >= 3) & (f_ >= 2) & (m <= 2), "Promising")
            .when((r <= 2) & (f_ >= 3) & (m >= 3), "Need Attention")
            .when((r <= 2) & (f_ >= 2) & (m >= 2), "About to Sleep")
            .when((r <= 2) & (f_ >= 4) & (m <= 2), "At Risk")
            .when((r <= 1) & (f_ >= 4) & (m >= 4), "Cannot Lose Them")
            .when((r <= 2) & (f_ <= 2) & (m >= 3), "Hibernating")
            .otherwise("Lost"),
        }
    )

    # customer_lifetime_value (:112-134): CLV + purchase-frequency tiers.
    clv = rfm.select(
        "customer_id",
        F.when(F.col("lifetime_spend") >= CLV_BANDS[0], "High Value")
        .when(F.col("lifetime_spend") >= CLV_BANDS[1], "Medium Value")
        .when(F.col("lifetime_spend") >= CLV_BANDS[2], "Low Value")
        .otherwise("Minimal Value")
        .alias("clv_tier"),
        F.when(F.col("count_lifetime_orders") >= 8, "Very Frequent")
        .when(F.col("count_lifetime_orders") >= 5, "Frequent")
        .when(F.col("count_lifetime_orders") >= 3, "Occasional")
        .otherwise("Rare")
        .alias("purchase_frequency_tier"),
    )

    # behavioral_segments (:136-161): A3 + A10 + two ladders.
    food = F.sum(F.when(F.col("is_food_order"), 1).otherwise(0))
    drink = F.sum(F.when(F.col("is_drink_order"), 1).otherwise(0))
    n_locs = F.countDistinct("location_id")
    behavioral = orders_.groupBy("customer_id").agg(
        food.alias("food_orders"),
        drink.alias("drink_orders"),
        n_locs.alias("locations_visited"),
        F.when(food > drink, "Food Focused")
        .when(drink > food, "Drink Focused")
        .otherwise("Balanced")
        .alias("product_preference"),
        F.when(n_locs >= 3, "Multi-Location")
        .when(n_locs == 2, "Two-Location")
        .otherwise("Single-Location")
        .alias("location_behavior"),
    )

    # product_preferences (:163-183): A8 deterministic mode + A10.
    base = items.select("order_id", "product_id", "product_name").join(
        orders_.select("order_id", "customer_id"), "order_id", "left"
    )
    name_counts = base.groupBy("customer_id", "product_name").agg(
        F.count(F.lit(1)).alias("n")
    )
    fav = (
        name_counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("customer_id").orderBy(
                    F.col("n").desc(), F.col("product_name").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("customer_id", F.col("product_name").alias("favorite_product"))
    )
    n_products = F.countDistinct("product_id")
    prefs = (
        base.groupBy("customer_id")
        .agg(
            n_products.alias("unique_products_purchased"),
            F.when(n_products >= 5, "Variety Seeker")
            .when(n_products >= 3, "Moderate Variety")
            .otherwise("Consistent Buyer")
            .alias("variety_preference"),
        )
        .join(fav, "customer_id", "left")
    )

    # churn_prediction (:185-205): F7 + F10 (IN-list).
    churn = rfm_segments.select(
        "customer_id",
        F.when(F.col("days_since_last_order") > 180, "High Risk")
        .when(F.col("days_since_last_order") > 90, "Medium Risk")
        .when(F.col("days_since_last_order") > 60, "Low Risk")
        .otherwise("Active")
        .alias("churn_risk"),
        F.when(
            F.col("rfm_segment").isin("Lost", "Hibernating", "Cannot Lose Them"),
            "Immediate Action",
        )
        .when(
            F.col("rfm_segment").isin("At Risk", "About to Sleep", "Need Attention"),
            "Monitor Closely",
        )
        .otherwise("Maintain")
        .alias("retention_action"),
    )

    # final (:207-243): J5 assembly with fill-'Unknown'/0 defaults.
    return (
        rfm_segments.join(clv, "customer_id", "left")
        .join(behavioral, "customer_id", "left")
        .join(prefs, "customer_id", "left")
        .join(churn, "customer_id", "left")
        .withColumns(
            {
                "clv_tier": F.coalesce("clv_tier", F.lit("Unknown")),
                "purchase_frequency_tier": F.coalesce(
                    "purchase_frequency_tier", F.lit("Unknown")
                ),
                "food_orders": F.coalesce("food_orders", F.lit(0)),
                "drink_orders": F.coalesce("drink_orders", F.lit(0)),
                "locations_visited": F.coalesce("locations_visited", F.lit(0)),
                "product_preference": F.coalesce("product_preference", F.lit("Unknown")),
                "location_behavior": F.coalesce("location_behavior", F.lit("Unknown")),
                "unique_products_purchased": F.coalesce(
                    "unique_products_purchased", F.lit(0)
                ),
                "favorite_product": F.coalesce("favorite_product", F.lit("Unknown")),
                "variety_preference": F.coalesce("variety_preference", F.lit("Unknown")),
                "churn_risk": F.coalesce("churn_risk", F.lit("Unknown")),
                "retention_action": F.coalesce("retention_action", F.lit("Unknown")),
            }
        )
    )


# ------------------------------------------------------------ time marts
def daily_summary(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """time_analytics.sql:15-37 — daily grain rollup (A1/A3/A4)."""
    orders_ = ref("orders", marts_core.orders, spark, sf_dir)
    sum_total = F.sum("order_total_cents")
    sum_cost = F.sum("order_cost_cents")
    n_vals = F.count("order_total_cents")
    return orders_.groupBy(F.col("ordered_at").alias("order_date")).agg(
        F.countDistinct("order_id").alias("daily_orders"),
        F.countDistinct("customer_id").alias("daily_unique_customers"),
        (sum_total / F.lit(100.0)).alias("daily_revenue"),
        (sum_cost / F.lit(100.0)).alias("daily_cost"),
        ((sum_total / F.lit(100.0)) - (sum_cost / F.lit(100.0))).alias("daily_profit"),
        F.when(n_vals > 0, (sum_total / F.lit(100.0)) / n_vals).alias(
            "daily_avg_order_value"
        ),
        F.countDistinct(
            F.when(F.col("customer_order_number") == 1, F.col("customer_id"))
        ).alias("daily_new_customers"),
        F.countDistinct(
            F.when(F.col("customer_order_number") > 1, F.col("customer_id"))
        ).alias("daily_returning_customers"),
        F.sum(F.when(F.col("is_food_order"), 1).otherwise(0)).alias("daily_food_orders"),
        F.sum(F.when(F.col("is_drink_order"), 1).otherwise(0)).alias("daily_drink_orders"),
    )


def weekly_summary(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """time_analytics.sql:39-54 — F1 week truncation (Monday start)."""
    orders_ = ref("orders", marts_core.orders, spark, sf_dir)
    sum_total = F.sum("order_total_cents")
    sum_cost = F.sum("order_cost_cents")
    n_vals = F.count("order_total_cents")
    return orders_.groupBy(
        F.date_trunc("week", F.col("ordered_at")).cast("date").alias("order_week")
    ).agg(
        F.countDistinct("order_id").alias("weekly_orders"),
        F.countDistinct("customer_id").alias("weekly_unique_customers"),
        (sum_total / F.lit(100.0)).alias("weekly_revenue"),
        (sum_cost / F.lit(100.0)).alias("weekly_cost"),
        ((sum_total / F.lit(100.0)) - (sum_cost / F.lit(100.0))).alias("weekly_profit"),
        F.when(n_vals > 0, (sum_total / F.lit(100.0)) / n_vals).alias(
            "weekly_avg_order_value"
        ),
    )


def monthly_summary(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """time_analytics.sql:56-76 — A5 positional multi-key group by + F2."""
    orders_ = ref("orders", marts_core.orders, spark, sf_dir)
    sum_total = F.sum("order_total_cents")
    sum_cost = F.sum("order_cost_cents")
    n_vals = F.count("order_total_cents")
    return orders_.groupBy(
        F.date_trunc("month", F.col("ordered_at")).cast("date").alias("order_month"),
        F.year("ordered_at").alias("order_year"),
        F.month("ordered_at").alias("order_month_num"),
        F.quarter("ordered_at").alias("order_quarter"),
    ).agg(
        F.countDistinct("order_id").alias("monthly_orders"),
        F.countDistinct("customer_id").alias("monthly_unique_customers"),
        (sum_total / F.lit(100.0)).alias("monthly_revenue"),
        (sum_cost / F.lit(100.0)).alias("monthly_cost"),
        ((sum_total / F.lit(100.0)) - (sum_cost / F.lit(100.0))).alias("monthly_profit"),
        F.when(n_vals > 0, (sum_total / F.lit(100.0)) / n_vals).alias(
            "monthly_avg_order_value"
        ),
    )


def cohort_retention(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """time_analytics.sql:78-109 — cohort grid with month-boundary diff
    (dbt.datediff month semantics = calendar-month delta)."""
    orders_ = ref("orders", marts_core.orders, spark, sf_dir)
    cohort = orders_.groupBy(
        F.date_trunc("month", F.col("ordered_at")).cast("date").alias("cohort_month"),
        F.col("customer_id"),
    ).agg(
        F.min("ordered_at").alias("first_order_date"),
        F.date_trunc("month", F.min("ordered_at")).cast("date").alias("first_order_month"),
    )
    period = (F.year("cohort_month") - F.year("first_order_month")) * 12 + (
        F.month("cohort_month") - F.month("first_order_month")
    )
    return cohort.groupBy(
        "first_order_month", "cohort_month", period.alias("period_number")
    ).agg(F.countDistinct("customer_id").alias("customers"))


def seasonal_trends(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """time_analytics.sql:111-126 — F2 extracts incl. dayofweek (1=Sunday)."""
    orders_ = ref("orders", marts_core.orders, spark, sf_dir)
    sum_total = F.sum("order_total_cents")
    n_vals = F.count("order_total_cents")
    return orders_.groupBy(
        F.month("ordered_at").alias("month_of_year"),
        F.quarter("ordered_at").alias("quarter_of_year"),
        F.dayofweek("ordered_at").alias("day_of_week"),
    ).agg(
        F.countDistinct("order_id").alias("seasonal_orders"),
        (sum_total / F.lit(100.0)).alias("seasonal_revenue"),
        F.when(n_vals > 0, (sum_total / F.lit(100.0)) / n_vals).alias(
            "seasonal_avg_order_value"
        ),
    )


def growth_metrics(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """time_analytics.sql:128-149 — W3 lag over the monthly grain."""
    monthly = ref("monthly_summary", monthly_summary, spark, sf_dir)
    w = Window.orderBy("order_month")
    prev_rev = F.lag("monthly_revenue", 1).over(w)
    prev_ord = F.lag("monthly_orders", 1).over(w)
    return monthly.select(
        "order_month",
        "monthly_revenue",
        prev_rev.alias("prev_month_revenue"),
        prev_ord.alias("prev_month_orders"),
        F.when(
            prev_rev > 0, (F.col("monthly_revenue") - prev_rev) / prev_rev
        ).alias("revenue_growth_rate"),
        F.when(
            prev_ord > 0,
            (F.col("monthly_orders") - prev_ord) * F.lit(1.0) / prev_ord,
        ).alias("order_growth_rate"),
    )


def time_analytics(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """reference: models/marts/time_analytics.sql:151-177 — J6 spine
    densification + P4 date-range filter. Only the spine+daily columns reach
    the final table (SURVEY §2.12 note); the other CTEs are the standalone
    analyses above."""
    spine = ref("metricflow_time_spine", metricflow_time_spine, spark, sf_dir)
    daily = ref("daily_summary", daily_summary, spark, sf_dir)
    as_of = F.lit(DEFAULT_AS_OF.isoformat()).cast("date")
    return (
        spine.filter(
            (F.col("date_day") >= F.lit(ANALYTICS_START.isoformat()).cast("date"))
            & (F.col("date_day") <= as_of)
        )
        .join(F.broadcast(daily), spine["date_day"] == daily["order_date"], "left")
        .select(
            "date_day",
            F.coalesce("daily_orders", F.lit(0)).alias("daily_orders"),
            F.coalesce("daily_revenue", F.lit(0.0)).alias("daily_revenue"),
            F.coalesce("daily_profit", F.lit(0.0)).alias("daily_profit"),
            F.coalesce("daily_unique_customers", F.lit(0)).alias(
                "daily_unique_customers"
            ),
            F.coalesce("daily_avg_order_value", F.lit(0.0)).alias(
                "daily_avg_order_value"
            ),
            F.date_trunc("week", F.col("date_day")).cast("date").alias("week_start"),
            F.date_trunc("month", F.col("date_day")).cast("date").alias("month_start"),
            F.year("date_day").alias("year"),
            F.month("date_day").alias("month"),
            F.quarter("date_day").alias("quarter"),
            F.dayofweek("date_day").alias("day_of_week"),
        )
    )
