"""Conditional-expression helpers (SURVEY §2.7 F7 tier ladders, §2.4 A9
safe-division).

``tier`` builds the reference's pervasive CASE-WHEN banding ladders
(customer_segmentation.sql:36-58 RFM scores, products.sql:155-160
performance tiers, ...). Branch order is semantics: first match wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_divide(num: Column, den: Column, otherwise=None) -> Column:
    """`CASE WHEN den > 0 THEN num / den ELSE NULL END`
    (products.sql:38-42 profit-margin pattern)."""
    result = F.when(den > 0, num / den)
    return result if otherwise is None else result.otherwise(F.lit(otherwise))


def tier(branches: Sequence[tuple[Column, object]], default=None) -> Column:
    """Ordered (condition, value) ladder → chained F.when().otherwise()."""
    if not branches:
        raise ValueError("tier() needs at least one (condition, value) branch")
    out = F.when(branches[0][0], F.lit(branches[0][1]))
    for cond, value in branches[1:]:
        out = out.when(cond, F.lit(value))
    return out.otherwise(F.lit(default)) if default is not None else out
