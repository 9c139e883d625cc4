"""DuckDB oracle SQL for the jaffle pipeline models.

These SQL strings are the *independent* re-implementation of the same
models in ANSI/DuckDB SQL over the same TPC-H-ish parquet views, used by
the driver's correctness gate. They share the mapping contract documented
in models/raw_layer.py and mirror the exact-cents arithmetic policy, so
value hashes match bit-for-bit.

Dialect deltas handled here (SURVEY §7.4):
* DuckDB ``datediff('day', a, b)`` vs Spark ``datediff(b, a)``
* DuckDB ``dayofweek`` is 0=Sunday; Spark is 1=Sunday → ``+ 1``
* DuckDB ``date_trunc`` returns DATE; Spark side casts to date
* division: cents / 100.0 is double in DuckDB; Spark side uses the
  DataFrame API where float literals are doubles
"""

from __future__ import annotations

# ---------------------------------------------------------------- raw layer
RAW_CTES: dict[str, str] = {
    "raw_customers": "SELECT c_custkey AS id, c_name AS name FROM customer",
    "raw_orders": """
        SELECT o.o_orderkey AS id,
               o.o_custkey AS customer,
               o.o_orderdate AS ordered_at,
               o.o_orderkey % 5 AS store_id,
               COALESCE(ip.items_subtotal, 0) AS subtotal,
               CAST((COALESCE(ip.items_subtotal, 0) * 8
                     - (COALESCE(ip.items_subtotal, 0) * 8) % 100) / 100 AS BIGINT)
                 AS tax_paid,
               COALESCE(ip.items_subtotal, 0)
                 + CAST((COALESCE(ip.items_subtotal, 0) * 8
                         - (COALESCE(ip.items_subtotal, 0) * 8) % 100) / 100 AS BIGINT)
                 AS order_total
        FROM orders o
        LEFT JOIN (
            SELECT l.l_orderkey,
                   CAST(SUM(CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
                     AS items_subtotal
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        ) ip ON o.o_orderkey = ip.l_orderkey
    """,
    "raw_items": """
        SELECT (l_orderkey * 10 + l_linenumber) * 100
                 + ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                                      ORDER BY l_partkey, l_suppkey,
                                               l_quantity, l_extendedprice) AS id,
               l_orderkey AS order_id,
               l_partkey AS sku
        FROM lineitem
    """,
    "raw_products": """
        SELECT p_partkey AS sku,
               p_name AS name,
               CASE WHEN p_partkey % 2 = 0 THEN 'jaffle' ELSE 'beverage' END AS type,
               CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price,
               p_type AS description
        FROM part
    """,
    "raw_supplies": """
        SELECT id, 'SUP-' || CAST(id AS VARCHAR) AS name,
               (id * 7 + sku * 3) % 500 + 10 AS cost,
               sku % 2 = 0 AS perishable,
               sku
        FROM (SELECT DISTINCT l_suppkey AS id, l_partkey AS sku FROM lineitem)
    """,
    "raw_stores": """
        SELECT CAST(r_regionkey AS BIGINT) AS id,
               r_name AS name,
               CAST(DATE '1994-01-01' + r_regionkey * 100 AS TIMESTAMP) AS opened_at,
               (r_regionkey + 4) / 100.0 AS tax_rate
        FROM region
    """,
}

# ------------------------------------------------------------ staging layer
STG_CTES: dict[str, str] = {
    "stg_customers": "SELECT id AS customer_id, name AS customer_name FROM raw_customers",
    "stg_orders": """
        SELECT id AS order_id,
               store_id AS location_id,
               customer AS customer_id,
               subtotal AS subtotal_cents,
               tax_paid AS tax_paid_cents,
               order_total AS order_total_cents,
               subtotal / 100.0 AS subtotal,
               tax_paid / 100.0 AS tax_paid,
               order_total / 100.0 AS order_total,
               CAST(ordered_at AS DATE) AS ordered_at
        FROM raw_orders
    """,
    "stg_order_items": """
        SELECT id AS order_item_id, order_id, sku AS product_id FROM raw_items
    """,
    "stg_products": """
        SELECT sku AS product_id,
               name AS product_name,
               type AS product_type,
               description AS product_description,
               price AS product_price_cents,
               price / 100.0 AS product_price,
               COALESCE(type = 'jaffle', FALSE) AS is_food_item,
               COALESCE(type = 'beverage', FALSE) AS is_drink_item
        FROM raw_products
    """,
    "stg_supplies": """
        SELECT md5(COALESCE(CAST(id AS VARCHAR), '_dbt_utils_surrogate_key_null_')
                   || '-' ||
                   COALESCE(CAST(sku AS VARCHAR), '_dbt_utils_surrogate_key_null_'))
                 AS supply_uuid,
               id AS supply_id,
               sku AS product_id,
               name AS supply_name,
               cost AS supply_cost_cents,
               cost / 100.0 AS supply_cost,
               perishable AS is_perishable_supply
        FROM raw_supplies
    """,
    "stg_locations": """
        SELECT id AS location_id,
               name AS location_name,
               tax_rate,
               CAST(opened_at AS DATE) AS opened_date
        FROM raw_stores
    """,
}

# --------------------------------------------------------------- core marts
MART_CTES: dict[str, str] = {
    "order_items": """
        SELECT i.order_item_id,
               i.order_id,
               i.product_id,
               o.ordered_at,
               p.product_name,
               p.product_price_cents,
               p.product_price,
               p.is_food_item,
               p.is_drink_item,
               s.supply_cost_cents,
               s.supply_cost_cents / 100.0 AS supply_cost
        FROM stg_order_items i
        LEFT JOIN stg_orders o ON i.order_id = o.order_id
        LEFT JOIN stg_products p ON i.product_id = p.product_id
        LEFT JOIN (
            SELECT product_id, CAST(SUM(supply_cost_cents) AS BIGINT) AS supply_cost_cents
            FROM stg_supplies GROUP BY product_id
        ) s ON i.product_id = s.product_id
    """,
    "orders": """
        SELECT o.*,
               COALESCE(s.order_cost_cents, 0) AS order_cost_cents,
               COALESCE(s.order_items_subtotal_cents, 0) AS order_items_subtotal_cents,
               COALESCE(s.count_order_items, 0) AS count_order_items,
               COALESCE(s.count_food_items, 0) AS count_food_items,
               COALESCE(s.count_drink_items, 0) AS count_drink_items,
               COALESCE(s.order_cost_cents, 0) / 100.0 AS order_cost,
               COALESCE(s.order_items_subtotal_cents, 0) / 100.0 AS order_items_subtotal,
               COALESCE(s.count_food_items, 0) > 0 AS is_food_order,
               COALESCE(s.count_drink_items, 0) > 0 AS is_drink_order,
               ROW_NUMBER() OVER (PARTITION BY o.customer_id
                                  ORDER BY o.ordered_at ASC, o.order_id ASC)
                 AS customer_order_number
        FROM stg_orders o
        LEFT JOIN (
            SELECT order_id,
                   CAST(SUM(supply_cost_cents) AS BIGINT) AS order_cost_cents,
                   CAST(SUM(product_price_cents) AS BIGINT) AS order_items_subtotal_cents,
                   COUNT(order_item_id) AS count_order_items,
                   CAST(SUM(CASE WHEN is_food_item THEN 1 ELSE 0 END) AS BIGINT) AS count_food_items,
                   CAST(SUM(CASE WHEN is_drink_item THEN 1 ELSE 0 END) AS BIGINT) AS count_drink_items
            FROM order_items GROUP BY order_id
        ) s ON o.order_id = s.order_id
    """,
    "customers": """
        SELECT c.customer_id,
               c.customer_name,
               s.count_lifetime_orders,
               s.first_ordered_at,
               s.last_ordered_at,
               s.lifetime_spend_pretax_cents,
               s.lifetime_tax_paid_cents,
               s.lifetime_spend_cents,
               s.lifetime_spend_pretax_cents / 100.0 AS lifetime_spend_pretax,
               s.lifetime_tax_paid_cents / 100.0 AS lifetime_tax_paid,
               s.lifetime_spend_cents / 100.0 AS lifetime_spend,
               CASE WHEN s.is_repeat_buyer THEN 'returning' ELSE 'new' END
                 AS customer_type
        FROM stg_customers c
        LEFT JOIN (
            SELECT customer_id,
                   COUNT(DISTINCT order_id) AS count_lifetime_orders,
                   COUNT(DISTINCT order_id) > 1 AS is_repeat_buyer,
                   MIN(ordered_at) AS first_ordered_at,
                   MAX(ordered_at) AS last_ordered_at,
                   CAST(SUM(subtotal_cents) AS BIGINT) AS lifetime_spend_pretax_cents,
                   CAST(SUM(tax_paid_cents) AS BIGINT) AS lifetime_tax_paid_cents,
                   CAST(SUM(order_total_cents) AS BIGINT) AS lifetime_spend_cents
            FROM orders_mart GROUP BY customer_id
        ) s ON c.customer_id = s.customer_id
    """,
}

MART_CTES["product_performance"] = """
    SELECT p.product_id, p.product_name, p.product_type, p.product_description,
           p.product_price, p.is_food_item, p.is_drink_item,
           COUNT(DISTINCT i.order_id) AS total_orders,
           COUNT(i.order_item_id) AS total_quantity_sold,
           CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0 AS total_revenue,
           CAST(SUM(i.supply_cost_cents) AS BIGINT) / 100.0 AS total_supply_cost,
           CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0
             - CAST(SUM(i.supply_cost_cents) AS BIGINT) / 100.0 AS total_profit,
           CASE WHEN SUM(i.supply_cost_cents) > 0 THEN
             (CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0
              - CAST(SUM(i.supply_cost_cents) AS BIGINT) / 100.0)
             / (CAST(SUM(i.supply_cost_cents) AS BIGINT) / 100.0) END
             AS profit_margin_ratio,
           CASE WHEN COUNT(i.order_item_id) > 0 THEN
             (CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0)
             / COUNT(i.order_item_id) END AS avg_selling_price,
           CASE WHEN COUNT(i.order_item_id) > 0 THEN
             (CAST(SUM(i.supply_cost_cents) AS BIGINT) / 100.0)
             / COUNT(i.order_item_id) END AS avg_supply_cost
    FROM stg_products p
    LEFT JOIN order_items i USING (product_id)
    GROUP BY 1, 2, 3, 4, 5, 6, 7
"""

MART_CTES["products"] = """
    WITH product_rankings AS (
        SELECT *,
            ROW_NUMBER() OVER (ORDER BY total_revenue DESC NULLS LAST, product_id ASC) AS revenue_rank,
            ROW_NUMBER() OVER (ORDER BY total_quantity_sold DESC NULLS LAST, product_id ASC) AS popularity_rank,
            ROW_NUMBER() OVER (ORDER BY total_profit DESC NULLS LAST, product_id ASC) AS profit_rank,
            ROW_NUMBER() OVER (ORDER BY profit_margin_ratio DESC NULLS LAST, product_id ASC) AS margin_rank
        FROM product_performance
    ),
    seasonal_analysis AS (
        SELECT i.product_id,
               EXTRACT(quarter FROM i.ordered_at) AS order_quarter,
               EXTRACT(month FROM i.ordered_at) AS order_month,
               COUNT(i.order_item_id) AS quarterly_quantity,
               CAST(SUM(i.product_price_cents) AS BIGINT) AS quarterly_revenue_cents,
               CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0 AS quarterly_revenue
        FROM order_items i GROUP BY 1, 2, 3
    ),
    product_seasonal_summary AS (
        SELECT product_id,
               MAX(quarterly_revenue) AS peak_quarter_revenue,
               MIN(quarterly_revenue) AS low_quarter_revenue,
               (CAST(SUM(quarterly_revenue_cents) AS BIGINT) / 100.0) / COUNT(*)
                 AS avg_quarterly_revenue,
               CASE WHEN MAX(quarterly_revenue) > 0
                    THEN (MAX(quarterly_revenue) - MIN(quarterly_revenue)) / MAX(quarterly_revenue)
                    ELSE 0 END AS seasonality_index
        FROM seasonal_analysis GROUP BY 1
    ),
    location_analysis AS (
        SELECT i.product_id, o.location_id,
               COUNT(i.order_item_id) AS location_quantity,
               CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0 AS location_revenue
        FROM order_items i LEFT JOIN orders_mart o USING (order_id)
        GROUP BY 1, 2
    ),
    product_location_summary AS (
        SELECT product_id,
               COUNT(DISTINCT location_id) AS locations_sold_at,
               MAX(location_revenue) AS best_location_revenue,
               MIN(location_revenue) AS worst_location_revenue
        FROM location_analysis GROUP BY 1
    )
    SELECT r.*,
           COALESCE(l.locations_sold_at, 0) AS locations_sold_at,
           COALESCE(l.best_location_revenue, 0) AS best_location_revenue,
           COALESCE(l.worst_location_revenue, 0) AS worst_location_revenue,
           COALESCE(s.peak_quarter_revenue, 0) AS peak_quarter_revenue,
           COALESCE(s.low_quarter_revenue, 0) AS low_quarter_revenue,
           COALESCE(s.avg_quarterly_revenue, 0) AS avg_quarterly_revenue,
           COALESCE(s.seasonality_index, 0) AS seasonality_index,
           CASE WHEN r.revenue_rank <= 5 THEN 'Top Performer'
                WHEN r.revenue_rank <= 10 THEN 'High Performer'
                WHEN r.revenue_rank <= 20 THEN 'Medium Performer'
                ELSE 'Low Performer' END AS performance_tier
    FROM product_rankings r
    LEFT JOIN product_location_summary l USING (product_id)
    LEFT JOIN product_seasonal_summary s USING (product_id)
"""

MART_CTES["supply_performance"] = """
    SELECT * ,
           CASE WHEN total_usage_quantity > 0
                THEN (supply_cost_incurred_cents / 100.0) / total_usage_quantity
                ELSE supply_cost END AS avg_cost_per_usage
    FROM (
        SELECT s.supply_uuid, s.supply_id, s.supply_name, s.product_id,
               s.supply_cost, s.supply_cost_cents, s.is_perishable_supply,
               COUNT(DISTINCT i.order_id) AS orders_using_supply,
               COUNT(i.order_item_id) AS total_usage_quantity,
               CAST(SUM(i.product_price_cents) AS BIGINT) AS revenue_generated_cents,
               CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0 AS revenue_generated,
               CAST(SUM(i.item_supply_cost_cents) AS BIGINT) AS supply_cost_incurred_cents,
               CAST(SUM(i.item_supply_cost_cents) AS BIGINT) / 100.0 AS total_supply_cost_incurred,
               CASE WHEN SUM(i.item_supply_cost_cents) > 0 THEN
                 (CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0)
                 / (CAST(SUM(i.item_supply_cost_cents) AS BIGINT) / 100.0) END
                 AS revenue_to_cost_ratio,
               CASE WHEN COUNT(i.order_item_id) > 0 THEN
                 (CAST(SUM(i.product_price_cents) AS BIGINT) / 100.0)
                 / COUNT(i.order_item_id) END AS avg_product_selling_price
        FROM stg_supplies s
        LEFT JOIN (
            SELECT product_id, order_id, order_item_id, product_price_cents,
                   supply_cost_cents AS item_supply_cost_cents
            FROM order_items
        ) i USING (product_id)
        GROUP BY 1, 2, 3, 4, 5, 6, 7
    )
"""

MART_CTES["supplier_analysis"] = """
    SELECT s.supply_name,
           COUNT(DISTINCT s.product_id) AS products_supplied,
           CASE WHEN COUNT(s.supply_cost_cents) > 0 THEN
             (CAST(SUM(s.supply_cost_cents) AS BIGINT) / 100.0)
             / COUNT(s.supply_cost_cents) END AS avg_supply_cost,
           CAST(SUM(p.total_usage_quantity) AS BIGINT) AS total_supplier_usage,
           CAST(SUM(p.revenue_generated_cents) AS BIGINT) / 100.0 AS total_supplier_revenue,
           CASE WHEN SUM(p.supply_cost_incurred_cents) > 0 THEN
             (CAST(SUM(p.revenue_generated_cents) AS BIGINT) / 100.0)
             / (CAST(SUM(p.supply_cost_incurred_cents) AS BIGINT) / 100.0) END
             AS supplier_efficiency_ratio
    FROM stg_supplies s
    LEFT JOIN supply_performance p USING (supply_uuid)
    GROUP BY 1
"""

MART_CTES["supplies"] = """
    WITH supply_rankings AS (
        SELECT *,
            ROW_NUMBER() OVER (ORDER BY total_usage_quantity DESC NULLS LAST, supply_uuid ASC) AS usage_rank,
            ROW_NUMBER() OVER (ORDER BY revenue_generated DESC NULLS LAST, supply_uuid ASC) AS revenue_contribution_rank,
            ROW_NUMBER() OVER (ORDER BY revenue_to_cost_ratio DESC NULLS LAST, supply_uuid ASC) AS efficiency_rank,
            ROW_NUMBER() OVER (ORDER BY total_supply_cost_incurred DESC NULLS LAST, supply_uuid ASC) AS cost_rank
        FROM supply_performance
    ),
    enriched AS (
        SELECT *,
            CASE WHEN supply_cost > 0 AND total_usage_quantity > 0
                 THEN total_supply_cost_incurred / supply_cost ELSE 0 END
              AS inventory_turnover_ratio,
            COALESCE(CASE WHEN total_usage_quantity > 0
                          THEN 365.0 / total_usage_quantity END, 0)
              AS avg_days_between_usage,
            CASE WHEN supply_cost > 0
                 THEN (avg_cost_per_usage - supply_cost) / supply_cost ELSE 0 END
              AS cost_variance_percentage,
            COALESCE(ABS(avg_cost_per_usage - supply_cost), 0) AS absolute_cost_variance
        FROM supply_rankings
    )
    SELECT *,
        CASE WHEN usage_rank <= 5 THEN 'High Usage'
             WHEN usage_rank <= 15 THEN 'Medium Usage'
             ELSE 'Low Usage' END AS usage_tier,
        CASE WHEN efficiency_rank <= 5 THEN 'High Efficiency'
             WHEN efficiency_rank <= 15 THEN 'Medium Efficiency'
             ELSE 'Low Efficiency' END AS efficiency_tier,
        CASE WHEN is_perishable_supply AND avg_days_between_usage > 7 THEN 'Risk: Slow Moving Perishable'
             WHEN NOT is_perishable_supply AND avg_days_between_usage > 30 THEN 'Risk: Slow Moving'
             WHEN cost_variance_percentage > 0.2 THEN 'Risk: High Cost Variance'
             ELSE 'Normal' END AS risk_category
    FROM enriched
"""

MART_CTES["locations"] = """
    WITH location_performance AS (
        SELECT l.location_id, l.location_name, l.tax_rate, l.opened_date,
               COUNT(DISTINCT o.order_id) AS total_orders,
               COUNT(DISTINCT o.customer_id) AS unique_customers,
               CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0 AS total_revenue,
               CAST(SUM(o.tax_paid_cents) AS BIGINT) / 100.0 AS total_tax_collected,
               CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS total_supply_cost,
               CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0
                 - CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS total_profit,
               CASE WHEN COUNT(o.order_total_cents) > 0 THEN
                 (CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0)
                 / COUNT(o.order_total_cents) END AS avg_order_value,
               CASE WHEN COUNT(o.order_cost_cents) > 0 THEN
                 (CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0)
                 / COUNT(o.order_cost_cents) END AS avg_order_cost,
               CASE WHEN SUM(o.order_cost_cents) > 0 THEN
                 (CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0
                  - CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0)
                 / (CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0) END
                 AS profit_margin_ratio,
               CAST(SUM(CASE WHEN o.is_food_order THEN 1 ELSE 0 END) AS BIGINT) AS food_orders,
               CAST(SUM(CASE WHEN o.is_drink_order THEN 1 ELSE 0 END) AS BIGINT) AS drink_orders,
               COUNT(DISTINCT CASE WHEN o.customer_order_number = 1 THEN o.customer_id END) AS new_customers,
               COUNT(DISTINCT CASE WHEN o.customer_order_number > 1 THEN o.customer_id END) AS returning_customers
        FROM stg_locations l
        LEFT JOIN orders_mart o USING (location_id)
        GROUP BY 1, 2, 3, 4
    ),
    location_rankings AS (
        SELECT *,
            ROW_NUMBER() OVER (ORDER BY total_revenue DESC NULLS LAST, location_id ASC) AS revenue_rank,
            ROW_NUMBER() OVER (ORDER BY total_orders DESC NULLS LAST, location_id ASC) AS order_volume_rank,
            ROW_NUMBER() OVER (ORDER BY unique_customers DESC NULLS LAST, location_id ASC) AS customer_base_rank,
            ROW_NUMBER() OVER (ORDER BY avg_order_value DESC NULLS LAST, location_id ASC) AS aov_rank,
            ROW_NUMBER() OVER (ORDER BY profit_margin_ratio DESC NULLS LAST, location_id ASC) AS profitability_rank
        FROM location_performance
    ),
    customer_behavior_analysis AS (
        SELECT o.location_id,
            CASE WHEN COUNT(c.count_lifetime_orders) > 0 THEN
              CAST(SUM(c.count_lifetime_orders) AS BIGINT) / COUNT(c.count_lifetime_orders) END
              AS avg_customer_lifetime_orders,
            CASE WHEN COUNT(c.lifetime_spend_cents) > 0 THEN
              (CAST(SUM(c.lifetime_spend_cents) AS BIGINT) / 100.0)
              / COUNT(c.lifetime_spend_cents) END AS avg_customer_lifetime_value,
            CASE WHEN COUNT(DISTINCT c.customer_id) > 0 THEN
              COUNT(DISTINCT CASE WHEN c.customer_type = 'returning' THEN c.customer_id END)
              * 1.0 / COUNT(DISTINCT c.customer_id)
              ELSE 0 END AS customer_retention_rate
        FROM orders_mart o
        LEFT JOIN customers c USING (customer_id)
        GROUP BY 1
    ),
    supply_chain_efficiency AS (
        SELECT location_id,
            CASE WHEN COUNT(profit_cents) > 0 THEN
              (CAST(SUM(profit_cents) AS BIGINT) / 100.0) / COUNT(profit_cents) END
              AS avg_profit_per_order,
            CASE WHEN COUNT(profit_cents) > 1 THEN
              sqrt((CAST(SUM(profit_sq) AS DOUBLE)
                    - CAST(CAST(SUM(profit_cents) AS BIGINT) AS DOUBLE)
                      * CAST(CAST(SUM(profit_cents) AS BIGINT) AS DOUBLE)
                      / COUNT(profit_cents))
                   / (COUNT(profit_cents) - 1)) / 100.0 END AS profit_variance
        FROM (
            SELECT location_id,
                   order_total_cents - order_cost_cents AS profit_cents,
                   CAST(order_total_cents - order_cost_cents AS HUGEINT)
                     * (order_total_cents - order_cost_cents) AS profit_sq
            FROM orders_mart
        ) GROUP BY 1
    ),
    efficiency_with_cov AS (
        SELECT *,
            CASE WHEN avg_profit_per_order > 0
                 THEN profit_variance / avg_profit_per_order END
              AS profit_coefficient_of_variation
        FROM supply_chain_efficiency
    )
    SELECT r.*,
           COALESCE(b.avg_customer_lifetime_orders, 0) AS avg_customer_lifetime_orders,
           COALESCE(b.avg_customer_lifetime_value, 0) AS avg_customer_lifetime_value,
           COALESCE(b.customer_retention_rate, 0) AS customer_retention_rate,
           COALESCE(e.avg_profit_per_order, 0) AS avg_profit_per_order,
           COALESCE(e.profit_variance, 0) AS profit_variance,
           COALESCE(e.profit_coefficient_of_variation, 0) AS profit_coefficient_of_variation,
           CASE WHEN r.revenue_rank <= 2 THEN 'Top Performer'
                WHEN r.revenue_rank <= 4 THEN 'High Performer'
                ELSE 'Standard Performer' END AS performance_tier,
           CASE WHEN COALESCE(b.customer_retention_rate, 0) >= 0.7 THEN 'High Retention'
                WHEN COALESCE(b.customer_retention_rate, 0) >= 0.5 THEN 'Medium Retention'
                ELSE 'Low Retention' END AS retention_tier
    FROM location_rankings r
    LEFT JOIN customer_behavior_analysis b USING (location_id)
    LEFT JOIN efficiency_with_cov e USING (location_id)
"""

# Frozen as-of clock + band constants — keep in sync with
# functions/dates.py DEFAULT_AS_OF and models/marts_segmentation.py.
AS_OF = "DATE '1998-09-01'"

MART_CTES["metricflow_time_spine"] = """
    SELECT CAST(range AS DATE) AS date_day
    FROM range(DATE '1992-01-01', DATE '1998-09-02', INTERVAL 1 DAY)
"""

MART_CTES["customer_segmentation"] = f"""
    WITH rfm_analysis AS (
        SELECT c.customer_id, c.customer_name, c.customer_type,
               c.count_lifetime_orders, c.lifetime_spend,
               c.first_ordered_at, c.last_ordered_at,
               datediff('day', c.last_ordered_at, {AS_OF}) AS days_since_last_order,
               c.count_lifetime_orders AS frequency_score,
               c.lifetime_spend AS monetary_score,
               CASE WHEN datediff('day', c.last_ordered_at, {AS_OF}) <= 30 THEN 5
                    WHEN datediff('day', c.last_ordered_at, {AS_OF}) <= 60 THEN 4
                    WHEN datediff('day', c.last_ordered_at, {AS_OF}) <= 90 THEN 3
                    WHEN datediff('day', c.last_ordered_at, {AS_OF}) <= 180 THEN 2
                    ELSE 1 END AS recency_score,
               CASE WHEN c.count_lifetime_orders >= 10 THEN 5
                    WHEN c.count_lifetime_orders >= 7 THEN 4
                    WHEN c.count_lifetime_orders >= 4 THEN 3
                    WHEN c.count_lifetime_orders >= 2 THEN 2
                    ELSE 1 END AS frequency_quintile,
               CASE WHEN c.lifetime_spend >= 1000.0 THEN 5
                    WHEN c.lifetime_spend >= 750.0 THEN 4
                    WHEN c.lifetime_spend >= 500.0 THEN 3
                    WHEN c.lifetime_spend >= 250.0 THEN 2
                    ELSE 1 END AS monetary_quintile
        FROM customers c
        WHERE c.customer_id IS NOT NULL
    ),
    rfm_segments AS (
        SELECT *,
            (recency_score + frequency_quintile + monetary_quintile) / 3.0 AS rfm_score,
            CASE WHEN recency_score >= 4 AND frequency_quintile >= 4 AND monetary_quintile >= 4 THEN 'Champions'
                 WHEN recency_score >= 3 AND frequency_quintile >= 3 AND monetary_quintile >= 3 THEN 'Loyal Customers'
                 WHEN recency_score >= 4 AND frequency_quintile <= 2 AND monetary_quintile >= 3 THEN 'Potential Loyalists'
                 WHEN recency_score >= 4 AND frequency_quintile <= 2 AND monetary_quintile <= 2 THEN 'New Customers'
                 WHEN recency_score >= 3 AND frequency_quintile >= 2 AND monetary_quintile <= 2 THEN 'Promising'
                 WHEN recency_score <= 2 AND frequency_quintile >= 3 AND monetary_quintile >= 3 THEN 'Need Attention'
                 WHEN recency_score <= 2 AND frequency_quintile >= 2 AND monetary_quintile >= 2 THEN 'About to Sleep'
                 WHEN recency_score <= 2 AND frequency_quintile >= 4 AND monetary_quintile <= 2 THEN 'At Risk'
                 WHEN recency_score <= 1 AND frequency_quintile >= 4 AND monetary_quintile >= 4 THEN 'Cannot Lose Them'
                 WHEN recency_score <= 2 AND frequency_quintile <= 2 AND monetary_quintile >= 3 THEN 'Hibernating'
                 ELSE 'Lost' END AS rfm_segment
        FROM rfm_analysis
    ),
    customer_lifetime_value AS (
        SELECT customer_id,
            CASE WHEN lifetime_spend >= 1500.0 THEN 'High Value'
                 WHEN lifetime_spend >= 750.0 THEN 'Medium Value'
                 WHEN lifetime_spend >= 250.0 THEN 'Low Value'
                 ELSE 'Minimal Value' END AS clv_tier,
            CASE WHEN count_lifetime_orders >= 8 THEN 'Very Frequent'
                 WHEN count_lifetime_orders >= 5 THEN 'Frequent'
                 WHEN count_lifetime_orders >= 3 THEN 'Occasional'
                 ELSE 'Rare' END AS purchase_frequency_tier
        FROM rfm_analysis
    ),
    behavioral_segments AS (
        SELECT o.customer_id,
            CAST(SUM(CASE WHEN o.is_food_order THEN 1 ELSE 0 END) AS BIGINT) AS food_orders,
            CAST(SUM(CASE WHEN o.is_drink_order THEN 1 ELSE 0 END) AS BIGINT) AS drink_orders,
            COUNT(DISTINCT o.location_id) AS locations_visited,
            CASE WHEN SUM(CASE WHEN o.is_food_order THEN 1 ELSE 0 END)
                      > SUM(CASE WHEN o.is_drink_order THEN 1 ELSE 0 END) THEN 'Food Focused'
                 WHEN SUM(CASE WHEN o.is_drink_order THEN 1 ELSE 0 END)
                      > SUM(CASE WHEN o.is_food_order THEN 1 ELSE 0 END) THEN 'Drink Focused'
                 ELSE 'Balanced' END AS product_preference,
            CASE WHEN COUNT(DISTINCT o.location_id) >= 3 THEN 'Multi-Location'
                 WHEN COUNT(DISTINCT o.location_id) = 2 THEN 'Two-Location'
                 ELSE 'Single-Location' END AS location_behavior
        FROM orders_mart o GROUP BY 1
    ),
    pref_base AS (
        SELECT i.order_id, i.product_id, i.product_name, o.customer_id
        FROM order_items i LEFT JOIN orders_mart o USING (order_id)
    ),
    favorite AS (
        SELECT customer_id, product_name AS favorite_product
        FROM (
            SELECT customer_id, product_name,
                   ROW_NUMBER() OVER (PARTITION BY customer_id
                                      ORDER BY COUNT(*) DESC, product_name ASC) AS rn
            FROM pref_base GROUP BY customer_id, product_name
        ) WHERE rn = 1
    ),
    product_preferences AS (
        SELECT b.customer_id,
            COUNT(DISTINCT b.product_id) AS unique_products_purchased,
            CASE WHEN COUNT(DISTINCT b.product_id) >= 5 THEN 'Variety Seeker'
                 WHEN COUNT(DISTINCT b.product_id) >= 3 THEN 'Moderate Variety'
                 ELSE 'Consistent Buyer' END AS variety_preference
        FROM pref_base b GROUP BY 1
    ),
    churn_prediction AS (
        SELECT customer_id,
            CASE WHEN days_since_last_order > 180 THEN 'High Risk'
                 WHEN days_since_last_order > 90 THEN 'Medium Risk'
                 WHEN days_since_last_order > 60 THEN 'Low Risk'
                 ELSE 'Active' END AS churn_risk,
            CASE WHEN rfm_segment IN ('Lost', 'Hibernating', 'Cannot Lose Them') THEN 'Immediate Action'
                 WHEN rfm_segment IN ('At Risk', 'About to Sleep', 'Need Attention') THEN 'Monitor Closely'
                 ELSE 'Maintain' END AS retention_action
        FROM rfm_segments
    )
    SELECT s.*,
        COALESCE(v.clv_tier, 'Unknown') AS clv_tier,
        COALESCE(v.purchase_frequency_tier, 'Unknown') AS purchase_frequency_tier,
        COALESCE(b.food_orders, 0) AS food_orders,
        COALESCE(b.drink_orders, 0) AS drink_orders,
        COALESCE(b.locations_visited, 0) AS locations_visited,
        COALESCE(b.product_preference, 'Unknown') AS product_preference,
        COALESCE(b.location_behavior, 'Unknown') AS location_behavior,
        COALESCE(p.unique_products_purchased, 0) AS unique_products_purchased,
        COALESCE(f.favorite_product, 'Unknown') AS favorite_product,
        COALESCE(p.variety_preference, 'Unknown') AS variety_preference,
        COALESCE(ch.churn_risk, 'Unknown') AS churn_risk,
        COALESCE(ch.retention_action, 'Unknown') AS retention_action
    FROM rfm_segments s
    LEFT JOIN customer_lifetime_value v USING (customer_id)
    LEFT JOIN behavioral_segments b USING (customer_id)
    LEFT JOIN product_preferences p ON s.customer_id = p.customer_id
    LEFT JOIN favorite f ON s.customer_id = f.customer_id
    LEFT JOIN churn_prediction ch ON s.customer_id = ch.customer_id
"""

MART_CTES["daily_summary"] = """
    SELECT o.ordered_at AS order_date,
           COUNT(DISTINCT o.order_id) AS daily_orders,
           COUNT(DISTINCT o.customer_id) AS daily_unique_customers,
           CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0 AS daily_revenue,
           CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS daily_cost,
           CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0
             - CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS daily_profit,
           CASE WHEN COUNT(o.order_total_cents) > 0 THEN
             (CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0)
             / COUNT(o.order_total_cents) END AS daily_avg_order_value,
           COUNT(DISTINCT CASE WHEN o.customer_order_number = 1 THEN o.customer_id END)
             AS daily_new_customers,
           COUNT(DISTINCT CASE WHEN o.customer_order_number > 1 THEN o.customer_id END)
             AS daily_returning_customers,
           CAST(SUM(CASE WHEN o.is_food_order THEN 1 ELSE 0 END) AS BIGINT) AS daily_food_orders,
           CAST(SUM(CASE WHEN o.is_drink_order THEN 1 ELSE 0 END) AS BIGINT) AS daily_drink_orders
    FROM orders_mart o GROUP BY 1
"""

MART_CTES["weekly_summary"] = """
    SELECT date_trunc('week', o.ordered_at) AS order_week,
           COUNT(DISTINCT o.order_id) AS weekly_orders,
           COUNT(DISTINCT o.customer_id) AS weekly_unique_customers,
           CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0 AS weekly_revenue,
           CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS weekly_cost,
           CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0
             - CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS weekly_profit,
           CASE WHEN COUNT(o.order_total_cents) > 0 THEN
             (CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0)
             / COUNT(o.order_total_cents) END AS weekly_avg_order_value
    FROM orders_mart o GROUP BY 1
"""

MART_CTES["monthly_summary"] = """
    SELECT date_trunc('month', o.ordered_at) AS order_month,
           EXTRACT(year FROM o.ordered_at) AS order_year,
           EXTRACT(month FROM o.ordered_at) AS order_month_num,
           EXTRACT(quarter FROM o.ordered_at) AS order_quarter,
           COUNT(DISTINCT o.order_id) AS monthly_orders,
           COUNT(DISTINCT o.customer_id) AS monthly_unique_customers,
           CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0 AS monthly_revenue,
           CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS monthly_cost,
           CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0
             - CAST(SUM(o.order_cost_cents) AS BIGINT) / 100.0 AS monthly_profit,
           CASE WHEN COUNT(o.order_total_cents) > 0 THEN
             (CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0)
             / COUNT(o.order_total_cents) END AS monthly_avg_order_value
    FROM orders_mart o GROUP BY 1, 2, 3, 4
"""

MART_CTES["cohort_retention"] = """
    SELECT first_order_month, cohort_month,
           (EXTRACT(year FROM cohort_month) - EXTRACT(year FROM first_order_month)) * 12
             + (EXTRACT(month FROM cohort_month) - EXTRACT(month FROM first_order_month))
             AS period_number,
           COUNT(DISTINCT customer_id) AS customers
    FROM (
        SELECT date_trunc('month', o.ordered_at) AS cohort_month,
               o.customer_id,
               MIN(o.ordered_at) AS first_order_date,
               date_trunc('month', MIN(o.ordered_at)) AS first_order_month
        FROM orders_mart o GROUP BY 1, 2
    ) GROUP BY 1, 2, 3
"""

MART_CTES["seasonal_trends"] = """
    SELECT EXTRACT(month FROM o.ordered_at) AS month_of_year,
           EXTRACT(quarter FROM o.ordered_at) AS quarter_of_year,
           dayofweek(o.ordered_at) + 1 AS day_of_week,
           COUNT(DISTINCT o.order_id) AS seasonal_orders,
           CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0 AS seasonal_revenue,
           CASE WHEN COUNT(o.order_total_cents) > 0 THEN
             (CAST(SUM(o.order_total_cents) AS BIGINT) / 100.0)
             / COUNT(o.order_total_cents) END AS seasonal_avg_order_value
    FROM orders_mart o GROUP BY 1, 2, 3
"""

MART_CTES["growth_metrics"] = """
    SELECT order_month, monthly_revenue,
           LAG(monthly_revenue, 1) OVER (ORDER BY order_month) AS prev_month_revenue,
           LAG(monthly_orders, 1) OVER (ORDER BY order_month) AS prev_month_orders,
           CASE WHEN LAG(monthly_revenue, 1) OVER (ORDER BY order_month) > 0 THEN
             (monthly_revenue - LAG(monthly_revenue, 1) OVER (ORDER BY order_month))
             / LAG(monthly_revenue, 1) OVER (ORDER BY order_month) END
             AS revenue_growth_rate,
           CASE WHEN LAG(monthly_orders, 1) OVER (ORDER BY order_month) > 0 THEN
             (monthly_orders - LAG(monthly_orders, 1) OVER (ORDER BY order_month))
             * 1.0 / LAG(monthly_orders, 1) OVER (ORDER BY order_month) END
             AS order_growth_rate
    FROM monthly_summary
"""

MART_CTES["time_analytics"] = f"""
    SELECT t.date_day,
           COALESCE(d.daily_orders, 0) AS daily_orders,
           COALESCE(d.daily_revenue, 0) AS daily_revenue,
           COALESCE(d.daily_profit, 0) AS daily_profit,
           COALESCE(d.daily_unique_customers, 0) AS daily_unique_customers,
           COALESCE(d.daily_avg_order_value, 0) AS daily_avg_order_value,
           date_trunc('week', t.date_day) AS week_start,
           date_trunc('month', t.date_day) AS month_start,
           EXTRACT(year FROM t.date_day) AS year,
           EXTRACT(month FROM t.date_day) AS month,
           EXTRACT(quarter FROM t.date_day) AS quarter,
           dayofweek(t.date_day) + 1 AS day_of_week
    FROM metricflow_time_spine t
    LEFT JOIN daily_summary d ON t.date_day = d.order_date
    WHERE t.date_day >= DATE '1995-01-01' AND t.date_day <= {AS_OF}
"""

# CTE name used for the orders mart to avoid clashing with the raw `orders`
# parquet view in DuckDB.
_CTE_NAME = {"orders": "orders_mart"}

# dependency edges, in topological order
_DEPS: dict[str, list[str]] = {
    "raw_customers": [], "raw_orders": [], "raw_items": [],
    "raw_products": [], "raw_supplies": [], "raw_stores": [],
    "stg_customers": ["raw_customers"],
    "stg_orders": ["raw_orders"],
    "stg_order_items": ["raw_items"],
    "stg_products": ["raw_products"],
    "stg_supplies": ["raw_supplies"],
    "stg_locations": ["raw_stores"],
    "order_items": ["stg_order_items", "stg_orders", "stg_products", "stg_supplies"],
    "orders": ["stg_orders", "order_items"],
    "customers": ["stg_customers", "orders"],
    "product_performance": ["stg_products", "order_items"],
    "products": ["product_performance", "order_items", "orders"],
    "supply_performance": ["stg_supplies", "order_items"],
    "supplier_analysis": ["stg_supplies", "supply_performance"],
    "supplies": ["supply_performance"],
    "locations": ["stg_locations", "orders", "customers"],
    "metricflow_time_spine": [],
    "customer_segmentation": ["customers", "orders", "order_items"],
    "daily_summary": ["orders"],
    "weekly_summary": ["orders"],
    "monthly_summary": ["orders"],
    "cohort_retention": ["orders"],
    "seasonal_trends": ["orders"],
    "growth_metrics": ["monthly_summary"],
    "time_analytics": ["metricflow_time_spine", "daily_summary"],
}

_ALL_CTES = {**RAW_CTES, **STG_CTES, **MART_CTES}


def _closure(targets: list[str]) -> list[str]:
    """Transitive deps of targets, topologically ordered."""
    seen: list[str] = []

    def visit(n: str) -> None:
        if n in seen:
            return
        for d in _DEPS.get(n, []):
            visit(d)
        seen.append(n)

    for t in targets:
        visit(t)
    return seen


def jaffle_sql(model: str, extra_select: str | None = None) -> str:
    """Full WITH-chained DuckDB SQL producing `model` (or a query over it)."""
    names = _closure([model])
    ctes = ",\n".join(
        f"{_CTE_NAME.get(n, n)} AS (\n{_ALL_CTES[n]}\n)" for n in names
    )
    final = extra_select or f"SELECT * FROM {_CTE_NAME.get(model, model)}"
    return f"WITH {ctes}\n{final}"


def jaffle_sql_multi(models: list[str], final_select: str) -> str:
    """WITH chain covering the dependency closure of several models at
    once (digest queries verify a whole model group in one driver slot)."""
    names = _closure(list(models))
    ctes = ",\n".join(
        f"{_CTE_NAME.get(n, n)} AS (\n{_ALL_CTES[n]}\n)" for n in names
    )
    return f"WITH {ctes}\n{final_select}"
