"""Driver-verified MERGE upsert fold (r5) — `incremental_strategy: merge`
as a value-checked query.

The reference configures dbt's merge strategy for warehouse targets that
run a native MERGE; the engine-side implementation is
:meth:`plans.acid.AcidTable.merge_rows` (partition-scoped rewrite with
optimistic concurrency). This module exercises that REAL materialization
path as a registered query: build a month-partitioned AcidTable from the
pre-1996 slice of raw orders, then MERGE one deterministic update batch —

* in-place updates: keys ≡ 0 (mod 7) flip status to 'R',
* partition moves: among those, keys ≡ 0 (mod 11) also move to the
  month of ``o_orderdate + 40 days`` (old row leaves one partition, new
  row lands in another — the both-sides rewrite case),
* inserts: all 1996-H1 orders are new keys,

and return the final table contents. The DuckDB oracle folds the same
batches relationally (base anti-join updates ∪ updates), so matched-
replace, unmatched-insert, untouched-carry and the move semantics are
all value-verified, not just pytest-pinned. Registered through the
``acid_digest`` group (queries/op_digests.py) beside the SCD2 snapshot.

Scale shape: identical to production merge_rows — the commit rewrites
only partitions holding a matched key's old row or receiving an update
row; every other month's files are carried by reference.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .acid import AcidTable

BASE_LO = "1994-01-01"
BASE_HI = "1995-12-31"
INS_LO = "1996-01-01"
INS_HI = "1996-06-30"

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "month"]

# the previous invocation's table dir — removed on the next call so the
# returned DataFrame stays readable until the caller collects it, while
# repeated bench runs leak at most one bounded table copy
_last_dir: list[str] = []


def _month(col: F.Column) -> F.Column:
    return F.date_format(col, "yyyy-MM")


def acid_merge_fold(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Run the two-batch merge fold through the real AcidTable commit
    protocol and return the final table state."""
    while _last_dir:
        shutil.rmtree(_last_dir.pop(), ignore_errors=True)

    orders = load_table(spark, "orders", sf_dir)
    in_base = F.col("o_orderdate").between(
        F.to_timestamp(F.lit(BASE_LO)), F.to_timestamp(F.lit(BASE_HI))
    )
    base = orders.where(in_base).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        _month(F.col("o_orderdate")).alias("month"),
    )
    flips = orders.where(in_base & (F.col("o_orderkey") % 7 == 0)).select(
        "o_orderkey",
        "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        F.when(
            F.col("o_orderkey") % 11 == 0,
            _month(F.col("o_orderdate") + F.expr("interval 40 days")),
        )
        .otherwise(_month(F.col("o_orderdate")))
        .alias("month"),
    )
    inserts = orders.where(
        F.col("o_orderdate").between(
            F.to_timestamp(F.lit(INS_LO)), F.to_timestamp(F.lit(INS_HI))
        )
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        _month(F.col("o_orderdate")).alias("month"),
    )

    path = tempfile.gettempdir() + f"/spark_graft_merge_fold_{uuid.uuid4().hex}"
    _last_dir.append(path)
    t = AcidTable(path)
    t.overwrite(base, partition_by=["month"])
    t.merge_rows(spark, flips.unionByName(inserts), "o_orderkey")
    return t.read(spark).select(*_COLS)


ORACLES: dict[str, str] = {
    "acid_merge_fold": f"""
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           strftime(o_orderdate, '%Y-%m') AS month
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '{BASE_LO}' AND TIMESTAMP '{BASE_HI}'
),
upd AS (
    SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
           CASE WHEN o_orderkey % 11 = 0
                THEN strftime(o_orderdate + INTERVAL 40 DAY, '%Y-%m')
                ELSE strftime(o_orderdate, '%Y-%m') END AS month
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '{BASE_LO}' AND TIMESTAMP '{BASE_HI}'
      AND o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus,
           strftime(o_orderdate, '%Y-%m') AS month
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '{INS_LO}' AND TIMESTAMP '{INS_HI}'
)
SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.month
FROM base b LEFT JOIN upd u ON b.o_orderkey = u.o_orderkey
WHERE u.o_orderkey IS NULL
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, month FROM upd
""",
}
