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


def test_cached_memo_is_bounded(spark, sf_dir):
    """Repeated standalone invocations reuse ONE cached plan per input
    (no cached-RDD stacking); release_cached unpersists and clears."""
    from dbt_jaffleshop_spark.models import base
    from dbt_jaffleshop_spark.models.marts_segmentation import customer_segmentation

    base.release_cached(spark)
    customer_segmentation(spark, sf_dir).count()
    n1 = len(base._CACHE_MEMO)
    assert n1 > 0
    customer_segmentation(spark, sf_dir).count()
    assert len(base._CACHE_MEMO) == n1
    base.release_cached(spark)
    assert not any(k[0] == id(spark) for k in base._CACHE_MEMO)
