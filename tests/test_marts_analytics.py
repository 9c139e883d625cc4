"""Oracle parity for the analytics marts (products / supplies / locations)."""

from __future__ import annotations

import pytest

from conftest import assert_parity

from dbt_jaffleshop_spark.models import marts_analytics
from dbt_jaffleshop_spark.queries.oracle_jaffle import jaffle_sql

MODELS = [
    "product_performance",
    "products",
    "supply_performance",
    "supplier_analysis",
    "supplies",
    "locations",
]


@pytest.mark.parametrize("name", MODELS)
def test_analytics_mart_parity(spark, oracle, sf_dir, name):
    df = getattr(marts_analytics, name)(spark, sf_dir)
    assert_parity(df, oracle, jaffle_sql(name))
