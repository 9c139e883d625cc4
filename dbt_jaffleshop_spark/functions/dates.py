"""Date/time expressions (reference: dbt.date_trunc / dbt.datediff shims and
dbt_date.get_base_dates — SURVEY §2.7 F1-F4, §2.1 S5).

Determinism: the reference's `current_date` sites (customer_segmentation.
sql:32, time_analytics.sql:175) are nondeterministic; the engine instead
threads an explicit ``as_of`` date (SURVEY §4.3-1) so every run — and the
DuckDB oracle — sees the same "now".
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Frozen "as-of" anchor for the TPC-H-ish testdata (o_orderdate spans
# 1992..1998-08); one month past the data's end so recency bands
# (30/60/90/180 days) spread across real values.
DEFAULT_AS_OF = dt.date(1998, 9, 1)


def day(col: Column | str) -> Column:
    """Timestamp → day-truncated DATE (stg_orders.sql:27 semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("date")


def week_start(col: Column | str) -> Column:
    """Monday-start week truncation (both Spark and DuckDB use ISO weeks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("week", c).cast("date")


def month_start(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("month", c).cast("date")


def date_spine(
    spark: SparkSession,
    start: dt.date,
    end: dt.date,
    col_name: str = "date_day",
) -> DataFrame:
    """Row-generating date spine (SURVEY §2.1 S5; metricflow_time_spine.sql).

    ``sequence()`` + ``explode`` generates JVM-side; no driver-side loop, so
    a 10-year spine (3.6k rows) or a century (36k) is equally trivial, and
    the result broadcasts in densification joins (J6).
    """
    return spark.sql(
        f"SELECT explode(sequence(DATE '{start:%Y-%m-%d}', DATE '{end:%Y-%m-%d}', "
        f"INTERVAL 1 DAY)) AS {col_name}"
    )
