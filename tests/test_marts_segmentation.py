"""Oracle parity for segmentation & time marts."""

from __future__ import annotations

import pytest

from conftest import assert_parity

from dbt_jaffleshop_spark.models import marts_segmentation
from dbt_jaffleshop_spark.queries.oracle_jaffle import jaffle_sql

MODELS = [
    "metricflow_time_spine",
    "customer_segmentation",
    "daily_summary",
    "weekly_summary",
    "monthly_summary",
    "cohort_retention",
    "seasonal_trends",
    "growth_metrics",
    "time_analytics",
]


@pytest.mark.parametrize("name", MODELS)
def test_segmentation_mart_parity(spark, oracle, sf_dir, name):
    df = getattr(marts_segmentation, name)(spark, sf_dir)
    assert_parity(df, oracle, jaffle_sql(name))
