"""Surrogate keys (reference: stg_supplies.sql:14 via
dbt_utils.generate_surrogate_key, dbt_utils 1.1.1 semantics).

dbt_utils compiles to
``md5(coalesce(cast(c1 as varchar), '_dbt_utils_surrogate_key_null_')
|| '-' || ...)`` — reproduced here column-for-column so keys match any
system using the same convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(*cols: Column | str) -> Column:
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))
