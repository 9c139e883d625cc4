"""Generic declarative data-test operators (SURVEY §2.9 T1-T5).

Each test compiles to a query whose result rows are the violations —
failure == any rows returned, exactly the reference's dbt-test semantics.
All are expressed as DataFrame ops so Catalyst pushes the predicates into
the scans; at 100 TB each test is a single pruned-column pass (or a
shuffle on the tested key for unique/relationships).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(df: DataFrame, col: str) -> DataFrame:
    """T1 — rows where col is NULL (e.g. stg_customers.yml:7-9)."""
    return df.filter(F.col(col).isNull())


def unique(df: DataFrame, col: str) -> DataFrame:
    """T2 — values appearing more than once (pairs with T1 on every PK)."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > 1)
    )


def accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    """T3 — non-NULL values outside the accepted list
    (customers.yml:30-33: customer_type ∈ {new, returning})."""
    return (
        df.filter(~F.col(col).isin(values) & F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def relationships(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> DataFrame:
    """T4 — FK check: child keys missing from parent, via LEFT ANTI join
    (stg_order_items.yml:13-17 etc.). NULL child keys are not violations
    (dbt semantics)."""
    parent_keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    return (
        child.filter(F.col(child_col).isNotNull())
        .select(child_col)
        .join(parent_keys, child_col, "left_anti")
    )


def expression_is_true(df: DataFrame, expression: str) -> DataFrame:
    """T5 — rows violating a row-level invariant
    (dbt_utils.expression_is_true; stg_orders.yml:5-7
    ``order_total - tax_paid = subtotal``). NULL expression results count
    as violations (NOT(NULL) is NULL → use coalesce)."""
    return df.filter(~F.coalesce(F.expr(expression), F.lit(False)))


def source_freshness(
    df: DataFrame,
    loaded_at_col: str,
    max_age_seconds: int,
    as_of,
) -> DataFrame:
    """T7 — source freshness (reference: __sources.yml:13,18 declares
    ``loaded_at_field`` for staleness checks). Violation-row contract:
    one row (max_loaded_at, age_seconds) iff the newest record is older
    than ``max_age_seconds`` relative to the injected ``as_of`` instant
    (frozen clock — SURVEY §4.3-1), else empty. A single agg over a
    pruned column scan."""
    agg = df.agg(F.max(loaded_at_col).alias("max_loaded_at")).select(
        "max_loaded_at",
        (
            F.lit(as_of).cast("timestamp").cast("long")
            - F.col("max_loaded_at").cast("timestamp").cast("long")
        ).alias("age_seconds"),
    )
    return agg.filter(
        F.col("max_loaded_at").isNull()
        | (F.col("age_seconds") > max_age_seconds)
    )


@dataclass
class CheckResult:
    name: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def run_checks(checks: dict[str, DataFrame]) -> list[CheckResult]:
    """Execute a batch of test queries; one action per test."""
    return [CheckResult(name, df.count()) for name, df in checks.items()]
