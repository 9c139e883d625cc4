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
        SELECT o_orderkey AS id,
               o_custkey AS customer,
               o_orderdate AS ordered_at,
               o_orderkey % 5 AS store_id,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS subtotal,
               CAST(ROUND(o_totalprice * 8, 0) AS BIGINT) AS tax_paid,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                 + CAST(ROUND(o_totalprice * 8, 0) AS BIGINT) AS order_total
        FROM orders
    """,
    "raw_items": """
        SELECT l_orderkey * 10 + l_linenumber AS id,
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
               s.order_cost_cents,
               s.order_items_subtotal_cents,
               s.count_order_items,
               s.count_food_items,
               s.count_drink_items,
               s.order_cost_cents / 100.0 AS order_cost,
               s.order_items_subtotal_cents / 100.0 AS order_items_subtotal,
               s.count_food_items > 0 AS is_food_order,
               s.count_drink_items > 0 AS is_drink_order,
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
