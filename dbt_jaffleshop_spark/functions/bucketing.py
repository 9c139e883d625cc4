"""Bucketed tables: shuffle-free co-located joins (SURVEY §7.4 toolbox).

The fourth scale-hostile join shape, complementing functions/joins.py:
two FACT-sized relations repeatedly joined on the same key. Salting
fixes skew and Bloom prefilters shrink the probe side, but both still
shuffle; when the join is recurring (the jaffle pattern: order_items ⋈
orders on order_id in every downstream mart, run after run), the 100 TB
answer is to pay the shuffle ONCE at write time and never again:

* :func:`write_bucketed` — persist a DataFrame hash-bucketed (and
  per-file sorted) on the join key via Spark's table bucketing
  (`bucketBy`/`sortBy` + `saveAsTable`). Works on the in-memory
  session catalog — no Hive metastore needed; pass ``path`` to keep
  the data external (e.g. under a test's tmp dir or the warehouse).
* :func:`bucketed_join` — join two such tables. With equal bucket
  counts on the join key, Catalyst plans a sort-merge join whose BOTH
  sides read pre-bucketed files with NO Exchange (the plan-pinned
  contract in tests/test_llm_ops_r8.py): each task merges bucket i of
  the left with bucket i of the right, the same co-location Iceberg's
  bucket partition transform or Hive bucketed tables buy.

At 100 TB: a fact-to-fact join's shuffle moves the whole table across
the network EVERY run; bucketing amortizes it into the initial write.
The trade is write-side file count (buckets × write-tasks files unless
the writer repartitions by the bucket key first — write_bucketed does)
and a fixed bucket count, which should be sized to the TARGET scale
(~2-4× total cores) since it cannot be changed without rewriting.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# saveAsTable would reject exotic names anyway, but the DROP below
# interpolates into SQL — restrict to plain (optionally db-qualified)
# identifiers up front so a weird name fails loudly, not as an
# injection/parse surprise (advisor r8).
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ per-file sorted) catalog table.

    Repartitions on the bucket key first so each bucket lands in ONE
    file per table (not one per upstream task) — bucket-local reads
    then scan exactly one file, and the per-file ``sortBy`` order is a
    total order per bucket, letting the bucketed sort-merge join skip
    its sort when Catalyst can prove it."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if not _IDENT.fullmatch(table_name):
        raise ValueError(
            f"write_bucketed: table_name {table_name!r} is not a plain "
            "[db.]identifier"
        )
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.repartition(num_buckets, *cols)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key — row-identical to
    the plain join of the same relations; with matching bucket counts
    the physical plan reads both sides bucket-aligned with no Exchange."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)
