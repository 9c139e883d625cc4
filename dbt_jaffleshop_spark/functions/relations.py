"""Relation-shaping helpers (r6) — the dbt_utils macros the reference
declares in `packages.yml:2-5` that operate on whole relations, as
DataFrame functions: ``union_relations`` (dbt_utils.union_relations),
``deduplicate`` (dbt_utils.deduplicate), and ``pivot``
(dbt_utils.pivot). Each keeps the macro's public semantics while
staying a pure Catalyst plan.

These are library functions (pytest-verified), not registered queries:
the jaffle models don't invoke the macros at runtime — dbt_utils is a
declared dependency whose generic tests/helpers the engine's other
modules already cover — but a reference user porting their OWN models
reaches for these three constantly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def union_relations(
    relations: dict[str, DataFrame],
    include_source_column: bool = True,
    source_column_name: str = "_source_relation",
) -> DataFrame:
    """dbt_utils.union_relations: union relations with DIFFERENT
    schemas by column name — the output carries the union of all
    columns, each relation contributing NULL for columns it lacks
    (dbt's column-superset semantics), plus the provenance column
    naming the source relation.

    Column order: first appearance across the inputs (dict order).
    A column present in several inputs with conflicting Spark types is
    left to `unionByName`'s implicit coercion rules — same as the
    macro, which delegates to the warehouse's UNION type resolution.

    100 TB shape: pure narrow plan — per-input projections and a union,
    no shuffle, no driver data movement.
    """
    if not relations:
        raise ValueError("union_relations requires at least one relation")
    ordered_cols: list[str] = []
    for df in relations.values():
        for c in df.columns:
            if c not in ordered_cols:
                ordered_cols.append(c)
    if include_source_column and source_column_name in ordered_cols:
        # appending a second column with the same name would produce an
        # ambiguous-reference failure far from the cause — fail fast
        raise ValueError(
            f"union_relations: an input already has a column named "
            f"{source_column_name!r}; pass a different source_column_name"
        )
    parts = []
    for name, df in relations.items():
        have = set(df.columns)
        cols: list[Column] = [
            F.col(c) if c in have else F.lit(None).alias(c)
            for c in ordered_cols
        ]
        if include_source_column:
            cols.append(F.lit(name).alias(source_column_name))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def deduplicate(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
) -> DataFrame:
    """dbt_utils.deduplicate: keep exactly one row per ``partition_by``
    group — the first under ``order_by`` (pass explicit asc()/desc()
    columns; add a unique tiebreaker for determinism, as the macro's
    docs also advise).

    100 TB shape: one shuffle on the partition keys; Spark plans the
    rank-1 filter as WindowGroupLimit (per-partition partial top-1
    before the exchange), so no task materializes a whole group. An
    EMPTY partition_by is refused (it would degenerate into a global
    single-task window — the anti-pattern this module's plan contracts
    forbid; dbt_utils.deduplicate requires the key too).
    """
    from pyspark.sql import Window

    if not partition_by:
        raise ValueError(
            "deduplicate requires partition keys — an empty partition_by "
            "would funnel the whole relation through one window task"
        )
    if "__dedup_rn" in df.columns:
        raise ValueError(
            "deduplicate: input already has a __dedup_rn column, which "
            "this function would silently overwrite and drop"
        )
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__dedup_rn", F.row_number().over(w))
        .where(F.col("__dedup_rn") == 1)
        .drop("__dedup_rn")
    )


def pivot(
    df: DataFrame,
    column: str,
    values: list,
    group_by: list[str],
    agg: str = "sum",
    then_value: Column | None = None,
    prefix: str = "",
    suffix: str = "",
) -> DataFrame:
    """dbt_utils.pivot: group by ``group_by`` and emit one aggregated
    output column per pinned value of ``column`` — exactly the macro's
    ``{{ agg }}(case when column = value then then_value else 0 end)``
    expansion, with the aggregate genuinely applied (not left to the
    caller). ``then_value`` defaults to 1 per matching row, so the
    default sum is a per-value count.

    ``values`` must be pinned by the caller (the macro requires the
    same via get_column_values) — an unpinned pivot would need a
    driver-side distinct scan, a hidden action this library refuses to
    take implicitly.

    100 TB shape: per-row conditional projection into ONE
    partial-aggregated groupBy on the grouping keys — the same plan as
    the hand-written conditional-aggregate marts (A3's shape). ``agg``
    resolves against a fixed whitelist of pyspark.sql.functions
    aggregates — never string-spliced.
    """
    aggs = {"sum": F.sum, "max": F.max, "min": F.min, "avg": F.avg,
            "count": F.count}
    if agg not in aggs:
        raise ValueError(f"pivot: unsupported agg {agg!r}")
    if not group_by:
        raise ValueError("pivot requires grouping keys")
    base = then_value if then_value is not None else F.lit(1)
    cols = [
        aggs[agg](
            F.when(F.col(column) == F.lit(v), base).otherwise(F.lit(0))
        ).alias(f"{prefix}{column}_{v}{suffix}")
        for v in values
    ]
    return df.groupBy(*group_by).agg(*cols)
