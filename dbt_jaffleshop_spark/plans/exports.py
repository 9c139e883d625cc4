"""Saved-query exports: `export_as: table` materialization (SURVEY §2 M6).

Every reference mart YAML attaches one export to its saved query, e.g.
`models/marts/orders.yml:156-159`:

    exports:
      - name: order_metrics
        config:
          export_as: table

dbt builds these as warehouse tables right after the mart they read. The
engine analogue: each export maps a reference export-table name to a
compiled `MetricQuery` from `semantic.jaffle_models.SAVED_QUERIES`; the
pipeline evaluates it INSIDE the run's materialization context — so the
query's `base` builder resolves, via ``ref()``, to the just-written mart
table instead of recomputing its lineage — and commits the result as an
atomic snapshot table (plans/acid.py) under the warehouse dir.

Scale notes: export input is a re-read of the materialized mart (one
scan, pruned to the query's columns), the aggregation is a single
groupBy shuffle at dimension cardinality, and the write is tiny (metric
rollups). The expensive work happened once, in the mart build.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ExportSpec:
    name: str            # reference export table name
    saved_query: str     # key into semantic.jaffle_models.SAVED_QUERIES
    depends_on: str      # pipeline model whose materialization it reads
    ref_yaml: str        # reference citation (file:line of the exports block)


# The 8 reference exports, one per mart YAML (`exports:` → `export_as:
# table`), mapped to the engine's compiled saved queries.
EXPORTS: dict[str, ExportSpec] = {
    e.name: e
    for e in [
        ExportSpec("order_metrics", "sq_order_metrics_daily", "orders",
                   "models/marts/orders.yml:156-159"),
        ExportSpec("customer_order_metrics", "sq_customer_order_metrics",
                   "customers", "models/marts/customers.yml:106-109"),
        ExportSpec("revenue_metrics", "sq_revenue_cumulative_daily",
                   "order_items", "models/marts/order_items.yml:178-181"),
        ExportSpec("product_performance_metrics", "sq_product_performance",
                   "products", "models/marts/products.yml:122-125"),
        ExportSpec("supply_chain_metrics", "sq_supply_chain", "supplies",
                   "models/marts/supplies.yml:128-131"),
        ExportSpec("location_performance_metrics", "sq_location_performance",
                   "locations", "models/marts/locations.yml:122-125"),
        ExportSpec("customer_segmentation_metrics", "sq_customer_segmentation",
                   "customer_segmentation",
                   "models/marts/customer_segmentation.yml:127-130"),
        # MONTH grain — the reference saved query's declared grain
        # (time_analytics.yml:118, TimeDimension('metric_time','month'));
        # the quarter-grain variant stays a standalone query, not this
        # export's source (ADVICE r7, medium).
        ExportSpec("time_analytics_metrics", "sq_time_analytics_monthly",
                   "time_analytics", "models/marts/time_analytics.yml:119-122"),
    ]
}
