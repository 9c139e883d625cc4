"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``dbt_jaffleshop_spark.queries.catalog``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-sufficient import: the driver (and any judge cold-importing this
# file from a foreign cwd) need not have the repo on sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the `customers` mart — the full core-DAG slice
    (scans → staging projections → order_items → orders → customers),
    exercising ~80% of the operator families (SURVEY §7.2)."""
    from dbt_jaffleshop_spark.models.marts_core import customers

    return customers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dbt_jaffleshop_spark.queries.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dbt_jaffleshop_spark.queries.catalog import ORACLE

    return dict(ORACLE)
