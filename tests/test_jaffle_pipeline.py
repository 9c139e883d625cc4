"""Oracle parity for the jaffle pipeline models (raw → staging → marts)."""

from __future__ import annotations

import pytest

from conftest import assert_parity

from dbt_jaffleshop_spark.models import marts_core, raw_layer, staging
from dbt_jaffleshop_spark.queries.oracle_jaffle import jaffle_sql

RAW = ["raw_customers", "raw_orders", "raw_items", "raw_products", "raw_supplies", "raw_stores"]
STG = ["stg_customers", "stg_orders", "stg_order_items", "stg_products", "stg_supplies", "stg_locations"]
MARTS = ["order_items", "orders", "customers"]


@pytest.mark.parametrize("name", RAW)
def test_raw_layer_parity(spark, oracle, sf_dir, name):
    df = getattr(raw_layer, name)(spark, sf_dir)
    assert_parity(df, oracle, jaffle_sql(name))


@pytest.mark.parametrize("name", STG)
def test_staging_parity(spark, oracle, sf_dir, name):
    df = getattr(staging, name)(spark, sf_dir)
    assert_parity(df, oracle, jaffle_sql(name))


@pytest.mark.parametrize("name", MARTS)
def test_core_mart_parity(spark, oracle, sf_dir, name):
    df = getattr(marts_core, name)(spark, sf_dir)
    assert_parity(df, oracle, jaffle_sql(name))
