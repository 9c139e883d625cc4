"""Driver-verified incremental materialization fold (acid_digest
member, r7).

dbt's flagship materialization (`materialized: incremental` —
reference `dbt_project.yml` marks marts as tables; warehouses run them
incrementally in production) is implemented in
:func:`..plans.dag.materialize_table_snapshot`: watermark-based
changed-partition detection + dynamic-partition overwrite with
O(changed) commit cost. The pytest
(tests/test_pipeline_run.py) pins the mechanics content-equality
cannot see — untouched partitions' files carried forward by reference;
this fold puts the END STATE under the same exact value verification
as every other operator:

1. **Initial build** — a month-partitioned orders mart from the feed
   truncated at a mid-month watermark cutoff (full overwrite path).
2. **Incremental catch-up** — the complete feed arrives; only the
   months holding rows past the stored watermark recompute (the
   cutoff month itself rebuilds wholly, capturing its late rows —
   idempotent per-partition semantics).
3. **Idempotent re-run** — the same feed again must be a no-op commit
   (nothing past the watermark), pinned by an assertion, not a row.

The returned table content must equal DuckDB's plain scan of the full
source — the split-feed fold loses and duplicates nothing.

100 TB: step 2's cost is O(changed partitions) — the incremental run
rewrites days/months, never the table; everything else is carried by
manifest reference (plans/acid.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .acid import AcidTable
from .dag import materialize_table_snapshot

# mid-month cutoff: the cutoff month's early rows land in the initial
# build, its late rows arrive "late" in the catch-up — forcing the
# whole-partition rebuild the semantics promise
CUTOFF = "1996-06-15"

_last_dir: list[str] = []


def _mart(orders: DataFrame) -> DataFrame:
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate",
    ).withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))


def incremental_orders_state(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Split-feed incremental build through the production
    materialize_table_snapshot path; returns the end-state table."""
    while _last_dir:
        shutil.rmtree(_last_dir.pop(), ignore_errors=True)
    orders = load_table(spark, "orders", sf_dir)
    root = tempfile.mkdtemp(prefix="incremental_fold_")
    _last_dir.append(root)
    table = AcidTable(os.path.join(root, "orders_inc"))

    early = _mart(orders.where(F.col("o_orderdate") < F.lit(CUTOFF)))
    full = _mart(orders)

    kwargs = dict(
        part_col="month",
        partition_by=["month"],
        watermark_col="o_orderdate",
        fingerprint="incremental-fold",
    )
    assert (
        materialize_table_snapshot(
            spark, table, early, incremental=False, **kwargs
        )
        == "full"
    )
    assert (
        materialize_table_snapshot(
            spark, table, full, incremental=True, **kwargs
        )
        == "incremental"
    )
    # replaying the identical feed must commit nothing (idempotence)
    v_before = table.current_version()
    assert (
        materialize_table_snapshot(
            spark, table, full, incremental=True, **kwargs
        )
        == "noop"
    )
    assert table.current_version() == v_before
    return table.read(spark).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "month"
    )


ORACLES = {
    "incremental_orders_state": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m') AS month
        FROM orders
    """,
}
