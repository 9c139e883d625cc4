"""Semantic/metric layer (SURVEY §2.10): declared models, metric
compiler, saved queries. `SEMANTIC_CATALOG` maps saved-query name →
(callable, oracle_sql) for driver registration."""

from __future__ import annotations

from collections.abc import Callable

from .jaffle_models import CUSTOMERS_MODEL, ORDER_ITEMS_MODEL, ORDERS_MODEL, SAVED_QUERIES
from .model import Dimension, Measure, Metric, MetricQuery, SemanticModel

SEMANTIC_CATALOG: dict[str, tuple[Callable, str]] = {
    name: (q.to_df, q.to_oracle_sql()) for name, q in SAVED_QUERIES.items()
}

__all__ = [
    "Dimension", "Measure", "Metric", "MetricQuery", "SemanticModel",
    "ORDERS_MODEL", "CUSTOMERS_MODEL", "ORDER_ITEMS_MODEL",
    "SAVED_QUERIES", "SEMANTIC_CATALOG",
]
