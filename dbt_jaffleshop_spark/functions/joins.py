"""Join utilities for skewed keys (SURVEY §7.4 scale toolbox).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew at runtime, but it only splits the PROBE
side of a sort-merge join. When one key dominates a shuffle so badly
that a single task owns it end-to-end (the classic hot-customer /
hot-document case at 100 TB), explicit salting is the deterministic fix:
spread the fact side's hot key over N sub-keys and replicate the
dimension side N times, so the join work for one key lands on N tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_cols: list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `on`, salted into `salts` sub-keys.

    `salt_cols` are fact-side columns whose hash spreads rows of a hot
    join key across tasks (use the fact's primary key: deterministic and
    uniform). The dim side is replicated `salts` times — keep it the
    smaller relation. Result is row-identical to the plain join: every
    fact row meets every matching dim row exactly once, because each
    fact row carries ONE salt value and the dim carries ALL of them.
    """
    if _SALT in fact.columns or _SALT in dim.columns:
        raise ValueError(f"{_SALT} column already present")
    fact_s = fact.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(salts))
    )
    dim_s = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return fact_s.join(dim_s, on=[*on, _SALT], how=how).drop(_SALT)
